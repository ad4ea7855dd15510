package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — prints a compact headline JSON as the FINAL stdout
  * line (driver contract: the driver tail-captures ~2 kB, so the
  * per-query map must NOT ride on that line) and writes the full
  * per-query map to `bench_full_r11.json` in the repo for cross-round
  * diffing. Rule-shape rows/s compares against the reference's three
  * published shapes (BASELINE.md: filter / transform / analytic+
  * partition, reference: test/e2e/stress_test.go:162-176).
  *
  * Results are forced through a noop sink so projection/codegen work is
  * actually executed (a bare count() would let Catalyst prune the
  * projections being measured).
  *
  * r11 protocol — BUDGETED, INCREMENTAL, KILL-SAFE. BENCH_r10 was
  * produced by a driver-timeout-killed run (rc=124): the smoke section
  * had grown past the wall budget, the kill lost the curate/pack series
  * entirely (-1), and everything measured alongside the over-budget tail
  * was contention-inflated (rule_filter 5.46 s vs 0.13 s quiet). Three
  * structural fixes:
  *   1. a soft wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default
  *      2300 s — the measured full pass-1 cost on a slow draw): once
  *      exceeded, remaining smoke stages/passes are
  *      SKIPPED and named in a `skipped` list, with `truncated: true`
  *      on the artifact — a truncated-but-honest artifact beats a
  *      killed one;
  *   2. the artifact file is rewritten after EVERY section and every
  *      smoke measurement, so a kill can never lose completed sections;
  *      a JVM shutdown hook prints the current headline JSON (marked
  *      truncated) if the normal end-of-run print never happened;
  *   3. smoke passes are pass-major with per-stage budget checks and a
  *      priority order (the round-gating stages first), so pass 1
  *      covers every stage before any stage gets a second pass.
  * Gate-critical sections keep their r8 order — latency FIRST (fresh
  * JVM), then rule-shape/headline throughput, then ANN recall, and all
  * scale smokes strictly last. The latency section's partitions=8 /
  * RocksDB confs are restored afterwards (r7 leaked them into the batch
  * stages). The curate end-to-end smoke runs a 1M/10M pair instead of
  * r9's 2M/20M (same 10x linearity signal at half the cost — r9
  * measured 578 s for curate@20M alone, which no 25-minute budget can
  * carry); keys are `curate_1m_sec`/`curate_10m_sec` accordingly.
  *
  * r12 additions — ARTIFACT-TRUSTWORTHY HEAVY RATIOS. BENCH_r11 (rc=0)
  * showed pack 17.5× and dup_spans 16.1× at 10× data on code whose
  * tune harnesses measure linear, purely because single draws of
  * 2-7×-variance stages landed on opposite contention tails. Three
  * changes: (1) repeat smoke passes run HEAVY-FIRST so the
  * pack/dup_spans/remove_spans/pack_chunks second draws at both scales
  * can never be starved by cheap stages' repeats; (2) every raw draw is
  * published (`scale_smoke_draws` in the full artifact, `heavy_draws`
  * on the headline line) so the min-of-N aggregate is auditable; (3)
  * budget 2300 → 2600 s — r11's budget dropped exactly those 8 heavy
  * repeat draws.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    // default sized to the MEASURED full pass-1 cost across r11
    // validation runs: 1901 s end-to-end on a fast draw, ~2300 s on a
    // slow one (same code — the heavy synthetic-corpus stages vary 2-7x
    // run-to-run on this box while the light stages are identical; a
    // 2000 s budget truncated the slow draw's last two stages). A budget
    // below slow-draw pass-1 cost silently loses tail series; 2300
    // covers it while staying well under the driver's observed wall
    // tolerance (r10's contended run exceeded 45 min before the kill).
    // r12: 2300 → 2600. r11's committed artifact showed pack 17.5x and
    // dup_spans 16.1x at 10x data on UNCHANGED code purely because their
    // single draws landed on opposite contention tails (the same stages
    // measured 2-7x apart between identical-config runs); the gate needs
    // a second in-run draw of the heavy stages at both scales (min-of-2,
    // heavy-first in pass 2 below), and r11's 2300 budget dropped exactly
    // those 8 extra passes. 2600 + the in-flight-stage overshoot stays
    // under the driver's observed >2700 s kill tolerance.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2600").toDouble
    def overBudget: Boolean = elapsedSec > budgetSec
    val skipped = scala.collection.mutable.LinkedHashSet[String]()
    var extraPassesSkipped = 0

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // buffer-building aggregates (collect_list in LSH bucket grouping,
      // typed Aggregator partials) fall back to SORT-based aggregation
      // after only 128 distinct groups per partition by default — for the
      // million-group (band, bucket) maps that turns a hash agg into an
      // external sort of the whole banded set (~2x on the 2M-doc curate
      // smoke). 64k in-memory groups is a few MB of entries.
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables0 = Tables.load(spark, sfDir)
    // local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q_embed,q_dedup times
    // only matching headline queries and skips the rule-shape harness
    // (driver never sets it → full run)
    val benchOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    // SPARK_GRAFT_LATENCY_ONLY=1: run ONLY the micro-batch latency section
    // (local A/B iteration on latency itself — fresh-JVM numbers)
    val latencyOnly = sys.env.getOrElse("SPARK_GRAFT_LATENCY_ONLY", "0") == "1"

    // the three baseline rule shapes (BASELINE.md)
    val ruleShapes0: List[(String, String)] = List(
      "rule_filter" ->
        "SELECT user_id, value FROM stream WHERE value > 25",
      "rule_transform" ->
        "SELECT user_id, value * 1.8 + 32 AS fahrenheit FROM stream",
      "rule_analytic" ->
        ("SELECT user_id, value, lag(value) OVER (PARTITION BY user_id) AS prev " +
          "FROM stream WITH (TIMESTAMP='ts', TIEBREAK='event_id')"))

    def timedOnce(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // median of 3 timed passes: a single GC pause or driver-box contention
    // spike otherwise lands directly in the reported number (BENCH_r04
    // showed 2-3x apparent regressions on untouched paths from exactly this)
    val timedPasses =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    def timed(df: => DataFrame): Double = {
      val ds = Seq.fill(timedPasses)(timedOnce(df)).sorted
      ds(ds.size / 2)
    }

    // ---- incremental artifact state (written after every section) ----
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val latency = scala.collection.mutable.LinkedHashMap[String, Double]()
    val annRecall = scala.collection.mutable.LinkedHashMap[String, Double]()
    val scaleSmoke = scala.collection.mutable.LinkedHashMap[String, Double]()
    // every raw smoke draw, in measurement order — the aggregate in
    // scale_smoke is only trustworthy when the reader can see the draws
    // it came from (r11's single-draw heavy readings were the lesson)
    val smokeDraws = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    // the high-variance heavy stages that MUST get a second in-run draw
    // at both scales before any light stage gets one (pass-2 order)
    val heavyStages = Seq("pack", "dup_spans", "remove_spans", "pack_chunks")
    var eventRows = 0L
    val replicate =
      sys.env.getOrElse("SPARK_GRAFT_RULE_REPLICATE", if (benchOnly.isDefined) "1" else "20").toInt
    val smokePasses =
      sys.env.getOrElse("SPARK_GRAFT_SMOKE_PASSES", "2").toInt.max(1)
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full_r12.json")

    def jmap(m: scala.collection.Map[String, Double], fmt: String): String =
      m.map { case (k, v) => s""""$k":${fmt.format(v)}""" }.mkString("{", ",", "}")
    def jdraws(m: scala.collection.Map[String, List[Double]]): String =
      m.map { case (k, vs) =>
        s""""$k":${vs.map(v => "%.2f".format(v)).mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    val heavyKeys: Set[String] =
      heavyStages.flatMap(n => Seq("2m", "20m").map(l => s"${n}_${l}_sec")).toSet
    val notes = "r12 budgeted protocol: soft wall budget (default 2600s, " +
      "SPARK_GRAFT_BENCH_BUDGET_SEC - r11's 2300 covered slow-draw " +
      "pass 1 but dropped all 8 heavy second draws; 2600 buys the " +
      "heavy stages' min-of-2 at both scales while staying inside the " +
      "driver's observed >2700s kill tolerance); repeat passes run " +
      "HEAVY-FIRST (pack,dup_spans,remove_spans,pack_chunks - the " +
      "2-7x-variance stages whose single draws made r11's pack read " +
      "17.5x and dup_spans 16.1x at 10x data on unchanged code) so a " +
      "budget stop starves cheap stages' repeats, never the heavy " +
      "ratios; EVERY raw draw is published (scale_smoke_draws here, " +
      "heavy_draws on the headline) so the min-of-N aggregate is " +
      "auditable; pack/curate moved from median to min over draws " +
      "(with two draws a median reports the WORSE one, and the " +
      "disclosed three-run data shows their variance is one-sided " +
      "contention noise too) " +
      "- over-budget smoke stages/passes are SKIPPED and listed in " +
      "'skipped' with truncated:true for pass-1 losses, because " +
      "BENCH_r10 (rc=124) showed a driver-killed run both loses whole " +
      "series (curate/pack were -1) and contention-inflates everything " +
      "measured beside the overrun (rule_filter 5.46s vs 0.13s quiet); " +
      "artifact file rewritten after every section and every smoke " +
      "measurement so a kill cannot lose completed sections; a shutdown " +
      "hook prints the headline JSON if the run is killed before the " +
      "normal print; latency section still FIRST (fresh JVM) with its " +
      "partitions=8/RocksDB confs restored after; smoke passes are " +
      "pass-major (every stage measured once before any second pass), " +
      "pass-1 cheap-insurance-first order pagerank,cc,pack_emit,curate," +
      "pack,remove_spans,pack_chunks,dup_spans (pagerank first: the " +
      "first 20M stage pays a residual ~2x first-execution warm-up even " +
      "pre-sized, so the cheapest stage absorbs it) - all stages " +
      "report min over " +
      "passes (contention is one-sided noise); " +
      "curate runs a 1M/10M pair (was 2M/20M; r9 measured 578s " +
      "for curate@20M alone - same 10x linearity signal, half the " +
      "cost); dup_spans/remove_spans size their corpus-global " +
      "hash-window shuffle to the WINDOW FAN-OUT (TextOps.fanoutParts: " +
      "sampled words/doc x estimated rows x 32B/row at 32MB targets) " +
      "instead of input plan bytes - the r10 auto-sizing " +
      "over-partitioned the 20M smoke ~4x past the tune's 512-part " +
      "optimum (quiet ratios with it: remove_spans 133.6s/14.5s = 9.2x " +
      "linear, auto within noise of the best forced config at both " +
      "scales); the JVM heap is now PRE-SIZED (-Xms=-Xmx in build.sbt) " +
      "because growing the heap tens of GB mid-pass costs repeated full " +
      "GCs exactly once, on the first heavy execution - DupSpansTune " +
      "A/B: first 20M pass 546.5s default vs 343.5s pre-sized, next " +
      "pass 416.8s vs 153.4s - which is what made first-position 20M " +
      "smoke readings (r10 remove_spans 425s) look super-linear on a " +
      "linear plan; driver GC still runs between smoke passes (untimed) " +
      "so stale shuffle files do not pile up (PackTune A/B at 20M: 27s " +
      "pass1 -> 122s pass2 without)"

    @volatile var headlinePrinted = false
    def headlineJson(truncated: Boolean): String = {
      val ruleSecs = jmap(results.filter(_._1.startsWith("rule_")), "%.4f")
      val tput = results.keys.filter(_.startsWith("rule_")).map { name =>
        val s = results(name)
        val rps = if (s > 0 && eventRows > 0) (eventRows / s).toLong else -1
        s""""$name":$rps"""
      }.mkString("{", ",", "}")
      val total = results.values.filter(_ > 0).sum
      s"""{"metric":"total","value":${"%.4f".format(total)},"unit":"sec",""" +
        s""""queries":$ruleSecs,"queries_file":"$fullPath","n_queries":${results.size},""" +
        s""""rows_per_sec":$tput,"micro_batch_latency_ms_5k_rows":${jmap(latency, "%.1f")},""" +
        s""""ann_recall":${jmap(annRecall, "%.3f")},"scale_smoke":${jmap(scaleSmoke, "%.4f")},""" +
        s""""heavy_draws":${jdraws(smokeDraws.filter(e => heavyKeys(e._1)))},""" +
        s""""event_rows":$eventRows,"truncated":$truncated,""" +
        s""""skipped":[${skipped.map(s => s""""$s"""").mkString(",")}],""" +
        s""""extra_passes_skipped":$extraPassesSkipped,""" +
        s""""budget_sec":${budgetSec.toLong},"elapsed_sec":${"%.0f".format(elapsedSec)},""" +
        s""""passes":{"timed":$timedPasses,"smoke":$smokePasses},"sf":"$sfDir"}"""
    }
    def writeArtifact(): Unit = {
      val total = results.values.filter(_ > 0).sum
      val full =
        s"""{"metric":"total","value":${"%.4f".format(total)},"unit":"sec",""" +
          s""""queries":${jmap(results, "%.4f")},""" +
          s""""micro_batch_latency_ms_5k_rows":${jmap(latency, "%.1f")},""" +
          s""""ann_recall":${jmap(annRecall, "%.3f")},"scale_smoke":${jmap(scaleSmoke, "%.4f")},""" +
          s""""scale_smoke_draws":${jdraws(smokeDraws)},""" +
          s""""event_rows":$eventRows,"truncated":${skipped.nonEmpty},""" +
          s""""skipped":[${skipped.map(s => s""""$s"""").mkString(",")}],""" +
          s""""extra_passes_skipped":$extraPassesSkipped,""" +
          s""""budget_sec":${budgetSec.toLong},"elapsed_sec":${"%.0f".format(elapsedSec)},""" +
          s""""passes":{"timed":$timedPasses,"smoke":$smokePasses},""" +
          s""""notes":"$notes","sf":"$sfDir"}"""
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), full + "\n")
      catch { case _: Throwable => () }
    }
    // kill-safety net: if the driver times the run out (r10: rc=124,
    // SIGTERM), print whatever has been measured so far as the headline
    // line — a truncated artifact beats a missing one
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!headlinePrinted) {
        skipped += "killed_before_finish"
        println(headlineJson(truncated = true))
        Console.flush()
      }
    }))

    // ---- micro-batch latency for the rule shapes, FIRST (fresh JVM; see
    // header). BASELINE.md comparability note: the reference reports
    // per-row push latency of an embedded engine; the Spark-comparable
    // figure is per-micro-batch latency.
    try if (benchOnly.isEmpty) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, unix_millis}
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val feed0 = tables0("events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          unix_millis(col("ts")).as("ts"))
        .as[(Long, Long, String, Double, Long)].take(200000)
      // SPARK_GRAFT_LATENCY_REPS replays the feed k times (fresh-JVM A/B
      // lever: a longer batch horizon separates JIT-warmup tail from true
      // steady state — the driver's default 1 keeps r6-r8 comparability)
      val feedReps =
        sys.env.getOrElse("SPARK_GRAFT_LATENCY_REPS", "1").toInt.max(1)
      val feed = Seq.fill(feedReps)(feed0).flatten
      // low-latency micro-batches want few state-store partitions: a 5k-row
      // batch over 32 shuffle partitions pays 32 task launches + state
      // commits per trigger — 8 is the deployment-appropriate setting for
      // this shape (the batch-throughput queries below keep 32)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // the analytic rule additionally measured on the transformWithState
      // lowering (STATEOP='tws', RocksDB-backed state); only the tws shape
      // switches the provider — rule_analytic stays on the default store so
      // its numbers remain comparable across rounds
      val latencyShapes = ruleShapes0 ++ List(
        "rule_analytic_tws" ->
          ("SELECT user_id, value, lag(value) OVER (PARTITION BY user_id) AS prev " +
            "FROM stream " +
            "WITH (TIMESTAMP='ts', TIMEUNIT='ms', TIEBREAK='event_id', STATEOP='tws')"))
      latencyShapes.foreach { case (name, sql) =>
        if (name.endsWith("_tws"))
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        else
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        val mem = MemoryStream[(Long, Long, String, Double, Long)]
        val src = mem.toDF()
          .toDF("event_id", "user_id", "event_type", "value", "ts")
        // the feed carries epoch-ms longs, so any WITH options must gain
        // TIMEUNIT='ms'; fail loudly if the rule-shape string drifted and
        // the rewrite no-ops (a silent no-op corrupts the latency numbers)
        val optStr = "WITH (TIMESTAMP='ts', TIEBREAK='event_id')"
        val rewritten =
          sql.replace(optStr, "WITH (TIMESTAMP='ts', TIMEUNIT='ms', TIEBREAK='event_id')")
        require(!sql.contains("WITH (") || rewritten != sql || sql.contains("TIMEUNIT"),
          s"rule shape '$name' has WITH options but not the expected '$optStr'")
        val out = GraftEngine.sql(rewritten, Map("stream" -> src))
        val q = out.writeStream.format("noop").outputMode("append").start()
        feed.grouped(5000).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        // running heap-fresh means the FIRST batches pay JIT + codegen
        // compilation; report steady state — median over the LAST quarter
        // of the 40 batches (chronological), the figure that extrapolates
        // to a long-running deployment. A/B (3 fresh-JVM runs): analytic
        // 315-343 ms here vs 996 ms when measured after the 20M smoke
        // stages in r7 — the r7 number was heap pressure, not code.
        val all = q.recentProgress.toList
          .filter(_.numInputRows > 0).map(_.batchDuration.toDouble)
        val steady = all.drop(all.size * 3 / 4).sorted
        q.stop()
        if (steady.nonEmpty)
          latency(name) = steady(steady.size / 2) // median ms per 5k-row batch
      }
    } catch { case _: Throwable => ()
    } finally {
      // restore batch-stage settings — r7 leaked partitions=8 + RocksDB
      // provider from here into everything that followed
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    writeArtifact()

    if (latencyOnly) {
      val lat0 = latency.map { case (k, v) => s""""$k":${"%.1f".format(v)}""" }
        .mkString("{", ",", "}")
      headlinePrinted = true
      println(s"""{"metric":"latency_only","micro_batch_latency_ms_5k_rows":$lat0}""")
      spark.stop()
      return
    }

    // rule-shape throughput is measured on a replicated in-memory stream so
    // per-job fixed overhead (~0.3s) doesn't swamp per-row cost — the
    // reference's numbers are per-row costs of a warm single-core loop
    val bigEvents = tables0("events")
      .crossJoin(spark.range(replicate).select(org.apache.spark.sql.functions.col("id").as("__rep")))
      .drop("__rep")
      .cache()
    eventRows = bigEvents.count() // warms cache + JVM
    val tables = tables0 + ("stream" -> bigEvents)

    val ruleShapes = if (benchOnly.isDefined) Nil else ruleShapes0
    // headline operator coverage at scale
    val headline0: List[String] = List(
      "q_agg_basic", "q_agg_stats", "q_join_multi_agg", "q_window_tumbling",
      "q_window_sliding", "q_window_session", "q_window_counting", "q_topk",
      "q_lag", "q_acc_running", "q_cep_pattern", "q_text_analysis",
      "q_dedup_exact", "q_dedup_minhash", "q_embed_topk", "q_distinct",
      "q_rank_funcs", "q_rollup", "q_dedup_simhash", "q_embed_ivf",
      "q_sample_hash", "q_dedup_components", "q_curate",
      "q_repetition", "q_gopher_quality", "q_pack_sequences", "q_embed_quantize",
      "q_dedup_lines", "q_decontaminate", "q_lm_ce", "q_shard",
      "q_join_asof", "q_sessionize", "q_dedup_incremental", "q_curation_report",
      "q_semantic_pairs", "q_quality_topfrac", "q_funnel", "q_retention",
      "q_pack_greedy", "q_sample_quantile", "q_curate_semantic",
      "q_dup_spans", "q_bm25", "q_keywords_tfidf",
      "q_html_extract", "q_pagerank", "q_profile", "q_blocklist_filter",
      "q_sample_pergroup_agg", "q_redact_cards", "q_rate_anomalies",
      "q_split_sentences", "q_hashed_features", "q_line_flags", "q_dedup_url",
      "q_histogram", "q_corr_matrix", "q_quantiles_by", "q_crawl_rank",
      "q_dedup_sig_pairs", "q_dedup_sig_pairs_simhash", "q_bpe_vocab",
      "q_pack_emit", "q_pack_emit_bounds", "q_pack_chunks", "q_train_pipeline",
      "q_remove_dup_spans", "q_shard_manifest", "q_hybrid_topk",
      "q_dedup_sig_pairs_simhash_incr", "q_embed_pq", "q_mixture_epochs",
      "q_warc_ingest", "q_interleave", "q_dedup_paragraphs", "q_byte_proxy",
      "q_join_interval", "q_embed_project", "q_domain_psl", "q_sitemap",
      "q_crawl_delay", "q_gate_report", "q_redaction_report",
      "q_frontier_schedule", "q_markdown", "q_code_flags",
      "q_remove_spans_incr", "q_fertility", "q_lang_segments",
      "q_paragraphs_incr")
    val headline = benchOnly match {
      case Some(ps) => headline0.filter(n => ps.exists(n.startsWith))
      case None     => headline0
    }

    // one untimed warm-up pass (JIT, codegen cache, OS page cache for the
    // parquet inputs) — the timed pass then measures steady-state cost, the
    // number that actually extrapolates to a long-running cluster
    val qmap = SparkEntry.queries
    ruleShapes.foreach { case (_, sql) =>
      try timedOnce(GraftEngine.sql(sql, tables)) catch { case _: Throwable => () }
    }
    headline.foreach { name =>
      try timedOnce(qmap(name)(spark, sfDir)) catch { case _: Throwable => () }
    }

    ruleShapes.foreach { case (name, sql) =>
      results(name) = try timed(GraftEngine.sql(sql, tables)) catch { case _: Throwable => -1.0 }
    }
    writeArtifact()
    headline.foreach { name =>
      results(name) =
        try timed(qmap(name)(spark, sfDir)) catch { case _: Throwable => -1.0 }
    }
    writeArtifact()

    // ANN quality gate: recall@10 of the approximate paths vs brute-force
    // topK at tuned defaults on the sf embeddings (uniform random vectors —
    // the worst case; clustered real embeddings land higher)
    if (benchOnly.isEmpty) try {
      import org.apache.spark.sql.functions.col
      val emb = tables0("embeddings").cache()
      val queries = emb.filter(col("vec_id") < 50).withColumnRenamed("vec_id", "query_id")
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(operators.Similarity.topK(emb, queries, k = 10))
      def recall(df: DataFrame): Double =
        (exact & pairs(df)).size.toDouble / exact.size
      annRecall("bucketed_recall_at_10") =
        recall(operators.Similarity.topKBucketed(emb, queries, k = 10))
      annRecall("ivf_recall_at_10") =
        recall(operators.Similarity.topKIvf(emb, queries, k = 10))
      annRecall("pq_recall_at_10") =
        recall(operators.Similarity.topKPq(emb, queries, k = 10))
      annRecall("ivfpq_recall_at_10") =
        recall(operators.Similarity.topKIvfPq(emb, queries, k = 10))
      emb.unpersist()
    } catch { case _: Throwable => () }
    writeArtifact()

    // 10x scale smoke for the stateful operators: the same shape timed at
    // 2M and 20M rows — catches nonlinear behavior (state growth, per-key
    // buffer blowups) that a single sf0.1-sized run can't see. ~Linear
    // scaling (ratio ≈ 10) is the pass condition.
    // SPARK_GRAFT_SCALE_SMOKE=force runs the smoke block even under a
    // BENCH_ONLY subset (local iteration on the smoke entries themselves)
    val smokeFlag = sys.env.getOrElse("SPARK_GRAFT_SCALE_SMOKE", "1")
    if ((benchOnly.isEmpty && smokeFlag == "1") || smokeFlag == "force") {
      val big10 = tables0("events")
        .crossJoin(spark.range(10L * replicate)
          .select(org.apache.spark.sql.functions.col("id").as("__rep")))
        .drop("__rep")
        .cache()
      scaleSmoke("rows_20m") = big10.count().toDouble
      val t10 = tables0 + ("stream" -> big10)
      val smokeShapes = List(
        "counting_window" ->
          ("SELECT user_id, sum(value) AS s FROM stream " +
            "GROUP BY user_id, CountingWindow(10) " +
            "WITH (TIMESTAMP='ts', TIEBREAK='event_id')"),
        "session_window" ->
          ("SELECT user_id, count(*) AS c FROM stream " +
            "GROUP BY user_id, SessionWindow('1h') WITH (TIMESTAMP='ts')"),
        "cep" ->
          ("SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY user_id " +
            "ORDER BY ts MEASURES COUNT(*) AS n ONE ROW PER MATCH " +
            "PATTERN (A{3}) WITHIN '12h' DEFINE A AS value > 50 )"))
      smokeShapes.foreach { case (name, sql) =>
        try {
          timedOnce(GraftEngine.sql(sql, tables)) // warm-up at 2M
          scaleSmoke(s"${name}_2m_sec") = timed(GraftEngine.sql(sql, tables))
          scaleSmoke(s"${name}_20m_sec") = timed(GraftEngine.sql(sql, t10))
        } catch { case _: Throwable => scaleSmoke(s"${name}_2m_sec") = -1.0 }
        writeArtifact()
      }
      big10.unpersist()
      // nothing below touches the replicated event stream — free its cached
      // blocks so the pipe-smoke stages' localCheckpoints don't fight the
      // storage pool (r8 A/B: cc@20M measured 248 s with this cache resident
      // vs 150 s cold / 40 s warm in an uncontended JVM — eviction pressure,
      // not the CC plan, was the apparent super-linearity)
      bigEvents.unpersist(true)

      // ---- LLM-pipeline 100 TB proof points: force-distributed connected
      // components, full curation, sequence packing, the corpus-global
      // dup-span window, and pagerank at 20M rows. The 2M/20M ratio (≈10 =
      // linear) is the signal. The CC graph is 20M chained nodes (diameter
      // 4, ~16M edges) so the distributed label propagation runs real
      // rounds; the curation corpus plants 10% exact dups so the pair
      // graph is ~2M edges and curate's CC ALSO runs the distributed path
      // (ccLocalThreshold=0).
      {
        import org.apache.spark.sql.functions._
        val smokeRows =
          sys.env.getOrElse("SPARK_GRAFT_PIPE_SMOKE_ROWS", "20000000").toLong
        def timedEager(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; val s = (System.nanoTime() - t0) / 1e9
          // driver GC kicks Spark's ContextCleaner between passes: the
          // previous pass's shuffle files are reference-held until a GC
          // notices them, and with a large quiet heap they pile up across
          // the smoke passes (PackTune A/B at 20M: 27 s pass 1 → 122 s
          // pass 2 without this; 23/26/35 s with). Cleanup time is NOT
          // part of the measured pass.
          System.gc(); Thread.sleep(1000)
          s
        }
        // chains of 5 nodes: clusters have diameter 4 → >1 propagation round
        def chainEdges(n: Long) = spark.range(n)
          .filter(col("id") % 5 =!= 4)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        // synthetic corpus at scan speed: 40 vocab-5000 words per doc; the
        // last 10% of ids reuse an early seed → exact-dup clusters of 2
        def synthDocs(n: Long) = {
          val seed = col("id") % lit(math.max(1L, n * 9 / 10))
          spark.range(n).select(
            col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(1), lit(40)),
              i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"),
            lit("synthetic").as("source"))
        }
        // untimed 2M warm-up per iterative stage: cold-JVM asymmetry
        // otherwise dominates the 2m/20m ratio (CcTune A/B at 20M: 153-200s
        // cold vs 40s warm, identical plan — JIT + codegen + GC ramp, not
        // the operator). The windows/cep stage above already warms up.
        try {
          operators.Dedup.connectedComponents(chainEdges(smokeRows / 10),
              localThreshold = 0L)
            .write.format("noop").mode("overwrite").save()
          operators.TextOps.dupSpans(synthDocs(smokeRows / 10), n = 8)
            .write.format("noop").mode("overwrite").save()
        } catch { case _: Throwable => () }
        // BPE smokes FIRST among the pipe stages (r8 ran them after the
        // 20M smokes and measured 1.9 s/round for the distributed loop in
        // a GC-pressured heap vs 0.45 s/round quiet-JVM — SURVEY cites
        // this position's number)
        val bpeMerges =
          sys.env.getOrElse("SPARK_GRAFT_BPE_SMOKE_MERGES", "1000").toInt
        if (bpeMerges > 0 && !overBudget) {
          scaleSmoke("bpe_1k_merges_sec") =
            try timedEager {
              val m = operators.Bpe.trainMerges(
                synthDocs(smokeRows / 10), numMerges = bpeMerges)
              scaleSmoke("bpe_merges_learned") = m.size.toDouble
            } catch { case _: Throwable => -1.0 }
          scaleSmoke("bpe_dist_100_merges_sec") =
            try timedEager {
              operators.Bpe.trainMerges(synthDocs(smokeRows / 10),
                numMerges = math.min(100, bpeMerges), localThreshold = 0L)
            } catch { case _: Throwable => -1.0 }
          writeArtifact()
        } else if (bpeMerges > 0) skipped += "bpe_smokes"

        def tokenIds(n: Long) = synthDocs(n).select(col("doc_id"),
          transform(split(col("text"), " "),
            w => pmod(hash(w), lit(30000)).cast("int")).as("token_ids"))

        // ALL remaining smoke stages, unified and priority-ordered, and
        // the loop is pass-major: every stage gets its pass-1 measurement
        // before any stage gets a second pass, so a budget stop costs
        // repetitions, never coverage. Order within a pass: the CHEAP
        // established-linear stages first (pack_emit/cc/pagerank — ~150 s
        // of insurance that cannot be starved by an expensive stage
        // overrunning), then the round-gating end-to-end pairs (curate/
        // pack — LOST in r10's killed run), then the expensive r10 weak
        // set (remove_spans/pack_chunks/dup_spans) — if the budget dies
        // mid-pass, the last casualties are the stages whose ratios other
        // harness runs (DupSpansTune/PackTune) can re-establish.
        // `agg` picks the cross-pass estimator: min for the pipe stages
        // (box contention is one-sided noise — identical-config
        // pack_emit@2M single passes measured 6 s and 134 s the same
        // evening in r9), median for the memory-heavy end-to-end stages
        // (their variance is heap-shaped, not spike-shaped).
        // curate runs a 1M/10M pair — see the header.
        case class Stage(name: String, labels: Seq[(String, Long)],
            agg: Seq[Double] => Double, run: Long => Unit)
        def minOk(xs: Seq[Double]): Double = {
          val ok = xs.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
        }
        def medianOk(xs: Seq[Double]): Double = {
          val ok = xs.filter(_ >= 0).sorted
          if (ok.isEmpty) -1.0 else ok(ok.size / 2)
        }
        val lbl = Seq("2m" -> smokeRows / 10, "20m" -> smokeRows)
        val stages: Seq[Stage] = Seq(
          // link-graph authority at scale: n/4 edges over n/40 nodes
          // (avg degree 10), 3 power-iteration rounds = 6 shuffles + 3
          // scalar dangling aggregates. FIRST deliberately: the first
          // 20M-scale stage of a run absorbs a residual ~2x first-
          // execution penalty even with the pre-sized heap (JIT + page-
          // cache warm-up) — pagerank is the cheapest stage, so it is
          // the cheapest place to pay that
          Stage("pagerank", lbl, minOk, { n =>
            val nodes = math.max(1L, n / 40)
            val e = spark.range(n / 4).select(
              (col("id") % nodes).as("src"),
              ((col("id") * 31 + 7) % nodes).as("dst"))
            operators.Graphs.pageRank(e, iters = 3)
              .write.format("noop").mode("overwrite").save()
          }),
          Stage("cc_distributed", lbl, minOk, { n =>
            operators.Dedup.connectedComponents(chainEdges(n), localThreshold = 0L)
              .write.format("noop").mode("overwrite").save()
          }),
          // packed-sequence MATERIALIZATION — the payload (token ids)
          // rides the shuffles: assignment is payload-free, then the ids
          // move twice (seq_id join + ordered concat). 40 ids/doc → 800M
          // ints at the 20M label.
          Stage("pack_emit", lbl, minOk, { n =>
            operators.Packing.emitPackedIds(tokenIds(n), budget = 2048,
                buckets = 2048)
              .write.format("noop").mode("overwrite").save()
          }),
          Stage("curate", Seq("1m" -> smokeRows / 20, "10m" -> smokeRows / 2),
            minOk, { n =>
              // synthetic vocab words land in lang_pred='und'; disable the
              // quality/token floors so dedup stages see the full corpus
              operators.Curation.curate(synthDocs(n), langs = Seq("und", "en"),
                  minQuality = 0.0, minTokens = 1, ccLocalThreshold = 0L)
                .write.format("noop").mode("overwrite").save()
            }),
          // min over draws for pack/curate too (was median): with the
          // standard two draws, a median takes the WORSE one, and the
          // three-run disclosure (pack@20M 68→187→271 s, identical
          // config) shows the variance is one-sided contention noise on
          // these stages as well — min is the artifact-grade estimator
          // the per-draw lists let the reader audit
          Stage("pack", lbl, minOk, { n =>
            operators.Packing.packSequences(synthDocs(n), budget = 2048,
                buckets = 2048)
              .write.format("noop").mode("overwrite").save()
          }),
          // the acting dup-span twin (r10 weak set: 27x in the killed
          // artifact): corpus-global hash window carrying (id, pos, hash),
          // first-occurrence election, per-doc removal rollup, payload
          // rebuild join
          Stage("remove_spans", lbl, minOk, { n =>
            operators.TextOps.removeDupSpans(synthDocs(n), n = 8)
              .write.format("noop").mode("overwrite").save()
          }),
          // concat-then-chunk packing (r10 weak set: 20x in the killed
          // artifact): payload moves twice + per-doc segment fan-out join
          Stage("pack_chunks", lbl, minOk, { n =>
            operators.Packing.emitPackedChunks(tokenIds(n), budget = 2048,
                buckets = 2048)
              .write.format("noop").mode("overwrite").save()
          }),
          // the heaviest text shuffle shape: corpus-global hash-keyed
          // span-sharing window (two shuffles, no join); 8-word windows
          // over 40-word docs → 33 hashed windows per doc
          Stage("dup_spans", lbl, minOk, { n =>
            operators.TextOps.dupSpans(synthDocs(n), n = 8)
              .write.format("noop").mode("overwrite").save()
          }))
        val obs = scala.collection.mutable.Map[String, List[Double]]()
          .withDefaultValue(Nil)
        // pass 1 keeps cheap-insurance-first order (a budget death costs
        // the stages other tune harnesses can re-establish); pass 2+ runs
        // HEAVY-FIRST — the whole point of the repeat pass is a second
        // draw of the 2-7x-variance stages whose single-draw ratios made
        // r11's pack read 17.5x and dup_spans 16.1x on unchanged code,
        // so those must not be starved by cheap stages' third decimals
        def passOrder(pass: Int): Seq[Stage] =
          if (pass == 1) stages
          else {
            val (heavy, light) = stages.partition(s => heavyStages.contains(s.name))
            heavy.sortBy(s => heavyStages.indexOf(s.name)) ++ light
          }
        for (pass <- 1 to smokePasses; st <- passOrder(pass); (label, n) <- st.labels) {
          val key = s"${st.name}_${label}_sec"
          // repeat draws also pre-check their PROJECTED cost (1.5x the
          // stage's last draw): the budget is soft — an in-flight stage
          // finishes — so starting a 200 s heavy repeat at budget-10 s
          // would overshoot into the driver's kill window. First draws
          // keep the plain check: coverage beats overshoot risk.
          val projectedOver = pass > 1 && obs(key).lastOption.exists(last =>
            last > 0 && elapsedSec + last * 1.5 > budgetSec)
          if (overBudget || projectedOver) {
            // a skipped FIRST pass is lost coverage (truncated artifact);
            // a skipped repeat pass only loses noise suppression — count
            // it, but don't flag the artifact truncated for it
            if (pass == 1) skipped += key else extraPassesSkipped += 1
          } else {
            obs(key) = obs(key) :+
              (try timedEager(st.run(n)) catch { case _: Throwable => -1.0 })
            scaleSmoke(key) = st.agg(obs(key))
            smokeDraws(key) = obs(key)
            writeArtifact()
          }
        }
        // denominator pass: the heavy stages' SMALL endpoints are ~10 s
        // jobs whose draw noise dominates the reported scale RATIO (four
        // identical-code remove_spans@2M draws spanned 10.2-38.8 s across
        // the r12 validation runs, moving the ratio 11x -> 16x while the
        // 20M numerator held within 15%); one extra draw costs ~1/15 of
        // a 20M draw and tightens the min where it moves the ratio most
        for (st <- stages if heavyStages.contains(st.name);
             (label, n) <- st.labels if label == "2m") {
          val key = s"${st.name}_${label}_sec"
          if (overBudget) extraPassesSkipped += 1
          else {
            obs(key) = obs(key) :+
              (try timedEager(st.run(n)) catch { case _: Throwable => -1.0 })
            scaleSmoke(key) = st.agg(obs(key))
            smokeDraws(key) = obs(key)
            writeArtifact()
          }
        }
      }
    }

    writeArtifact()
    headlinePrinted = true
    println(headlineJson(truncated = skipped.nonEmpty))
    spark.stop()
  }
}
