package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftEngine, SparkTestBase, Tables}

/** Pins the physical-plan properties the engine's scale story depends on:
  * filter/column pushdown to the parquet scan, broadcast joins for lookup
  * tables, no extra shuffles. A regression here is a performance bug even
  * when results stay correct. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  lazy val tables = Tables.load(spark, "/root/testdata/sf0.001")

  private def planOf(sql: String): String = {
    val df = GraftEngine.sql(sql, tables)
    df.queryExecution.executedPlan.toString
  }

  test("the multi-format extraction front door is one shuffle-free stage") {
    // sniff + routed extraction over raw bytes must stay a per-row
    // projection: at 100 TB its cost is exactly one pass over the
    // bytes, no exchange, no materialization between route and extract
    import spark.implicits._
    val df = graft.operators.Extract.autoTextPlan(
      Seq((1L, "<html><body>x</body></html>".getBytes("UTF-8")))
        .toDF("doc_id", "bytes"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sort"), p)
  }

  test("filters and column pruning reach the parquet scan") {
    val p = planOf("SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("lookup joins broadcast the dimension side (no stream-side shuffle)") {
    val p = planOf(
      "SELECT l_orderkey, s.s_name FROM lineitem JOIN supplier s ON l_suppkey = s.s_suppkey")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only exchange is the broadcast of the dimension table
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("aggregation uses partial (map-side) combine and one shuffle") {
    val p = planOf(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("whole-stage codegen covers the scalar pipeline") {
    val p = planOf(
      "SELECT upper(p_brand) AS b, length(p_name) AS l FROM part WHERE p_size > 10")
    // '*' prefix marks whole-stage-codegen'd operators in the plan string
    assert(p.contains("*("), p)
  }

  test("ORDER BY + LIMIT lowers to top-k (TakeOrderedAndProject)") {
    val p = planOf(
      "SELECT l_orderkey, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC LIMIT 10")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("MinHash LSH candidate join is an equi hash join, never a cartesian") {
    val pairs = graft.operators.Dedup.minHashPairs(tables("documents"), threshold = 0.7)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    pairs.unpersist()
  }

  test("bucketed ANN band-join exchanges carry ids only, no vectors") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = tables("embeddings")
    val planes = graft.operators.Similarity.hyperplanes(12, 64, 42L)
    val csigs = emb.select(col("vec_id").as("__cid"), col("embedding").as("__cv"),
      graft.operators.Similarity.lshSignature(col("embedding"), planes).as("sig"))
    val qsigs = emb.limit(10).select(col("vec_id").as("__qid"),
      col("embedding").as("__qv"),
      graft.operators.Similarity.lshSignature(col("embedding"), planes).as("sig"))
    // executedPlan (post-EnsureRequirements) carries the exchanges; AQE off
    // so they are concrete ShuffleExchangeExec nodes, not an adaptive root
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = graft.operators.Similarity.annCandidates(csigs, qsigs, 12, 4)
      val exchanges = cand.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        val names = e.output.map(_.name)
        assert(!names.exists(n => n.contains("__cv") || n.contains("__qv") ||
          n.contains("embedding")), s"vector column in band exchange: $names")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("semantic-pair generation is equi-join only, never a cartesian") {
    val pairs = graft.operators.Similarity.semanticPairs(tables("embeddings"),
      threshold = 0.3, nlist = 16, kmeansIter = 0, dims = 64)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    pairs.unpersist()
  }

  test("approx quality gate broadcasts the per-group threshold table") {
    import org.apache.spark.sql.functions._
    val p = graft.operators.TextOps.keepTopQualityApprox(tables("documents"),
      col("n_chars"), 0.25, col("lang"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("funnel is one key shuffle then a per-partition fold, no per-step join") {
    import org.apache.spark.sql.functions._
    val ev = tables("events").select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t"))
    val p = graft.operators.Events.funnel(ev, "user_id", "event_type", "t",
      Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("canonical-keep anti-join broadcasts the materialized drop set") {
    import org.apache.spark.sql.functions._
    val docs = tables("documents")
    val pairs = graft.operators.Dedup.minHashPairs(docs, threshold = 0.7)
    val kept = graft.operators.Dedup.keepCanonical(docs, pairs)
    val p = kept.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    pairs.unpersist()
  }

  test("boilerplate line removal anti-joins a broadcast hot-line list") {
    val p = graft.operators.Dedup.dropCommonLines(tables("documents"), maxDf = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination broadcasts the benchmark n-gram side") {
    import org.apache.spark.sql.functions._
    val docs = tables("documents")
    val p = graft.operators.Dedup.contamination(
        docs.filter(col("doc_id") >= 100), docs.filter(col("doc_id") < 100))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("text-analysis kernel stays in whole-stage codegen with one scan") {
    val an = graft.operators.TextOps.analyze(tables("documents"))
    val p = an.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // codegen'd project over the kernel call
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange"), p) // pure map-side — no shuffle
  }

  test("filters over derived kernel columns invoke the kernel exactly once per row") {
    // PushPredicateThroughNonJoin substitutes projection aliases into every
    // filter conjunct it pushes, and FilterExec does no subexpression
    // elimination — without the Generate barrier in TextOps.withKernelColumn
    // the curate-shaped filter below cloned the textStats kernel 121× per
    // row (13× wall-clock). Pin: exactly ONE kernel invocation in the
    // filtered physical plan, and still zero shuffles.
    import org.apache.spark.sql.functions._
    val filtered = graft.operators.TextOps.analyze(tables("documents"))
      .filter(col("lang_pred").isin("en") &&
        col("quality") >= 0.7 && col("token_count").between(5, 100000))
    val p = filtered.queryExecution.executedPlan.toString
    assert("textStats".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange"), p)
    // same barrier guards the deflate kernel
    val cp = graft.operators.TextOps.compressionMetrics(tables("documents"))
      .filter(col("flag_compression") && col("deflate_ratio") > 0.2)
      .queryExecution.executedPlan.toString
    assert("compressionStats".r.findAllIn(cp).size == 1, cp)
    assert(!cp.contains("Exchange"), cp)
  }

  test("repetition/gopher/redact/quantize are scan-speed: no shuffle, codegen") {
    import org.apache.spark.sql.functions._
    val checks = Seq(
      graft.operators.TextOps.repetitionMetrics(tables("documents")),
      graft.operators.TextOps.gopherFlags(tables("documents")),
      tables("documents").select(graft.operators.TextOps.redact(col("text"))),
      tables("embeddings").select(
        graft.operators.Similarity.l2Normalize(col("embedding")),
        graft.operators.Similarity.quantizeInt8(col("embedding"))))
    checks.foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(p.contains("*("), p)
    }
  }

  test("chunking and intra-doc line dedup are scan-speed: zero shuffle") {
    // chunkDocs explodes inside the scan stage; dropRepeatedLines is pure
    // per-row array exprs — neither may introduce an Exchange, so both
    // compose with a downstream shuffle (embedding, packing) for free
    val ch = graft.operators.TextOps.chunkDocs(
        tables("documents"), maxTokens = 20, overlap = 4)
      .queryExecution.executedPlan.toString
    assert(!ch.contains("Exchange"), ch)
    assert("Scan parquet".r.findAllIn(ch).size == 1, ch)
    val dl = graft.operators.Dedup.dropRepeatedLines(tables("documents"))
      .queryExecution.executedPlan.toString
    assert(!dl.contains("Exchange"), dl)
  }

  test("sequence packing never sorts the payload: slim window + hash join-back") {
    val p = graft.operators.Packing.packSequences(
        tables("documents"), budget = 512, buckets = 16)
      .queryExecution.executedPlan.toString
    // the ONLY sort in the plan is the slim (id, count, bucket) window
    // sort; the document payload takes one hash shuffle into a
    // shuffled-hash join (never SortMergeJoin, never a payload sort)
    assert("Sort \\[".r.findAllIn(p).size == 1, p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("chunked materialization never sorts the payload either") {
    import org.apache.spark.sql.functions._
    val ids = tables("documents").select(col("doc_id"),
      transform(split(col("text"), " "), w => hash(w)).as("token_ids"))
    val p = graft.operators.Packing.emitPackedChunks(ids, budget = 512, buckets = 16)
      .queryExecution.executedPlan.toString
    // slim window sort only; payload joins via shuffled-hash and
    // concatenates under an object-hash aggregate (array_sort is an
    // expression, not a Sort node)
    assert("Sort \\[".r.findAllIn(p).size == 1, p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("temperature mixture broadcasts the rate table onto the scan") {
    import org.apache.spark.sql.functions._
    val p = graft.operators.Sampling.temperatureMixture(
        tables("documents"), col("source"), col("doc_id"), tau = 0.5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("as-of join is one union + one window shuffle — no join operator at all") {
    import org.apache.spark.sql.functions._
    val ev = tables("events")
    val p = graft.operators.Joins.asof(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("pv")),
        Seq("user_id"), valueCols = Seq("pv"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p) // the theta-join formulation never appears
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("range join plans as an equi join on the bucket key, never a nested loop") {
    import org.apache.spark.sql.functions._
    val ev = tables("events")
    val p = graft.operators.Joins.range(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("cts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + lit(3600000000L)).as("e")),
        Seq("user_id"), "cts", "s", "e", bucketWidth = 3600000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("incremental (new-vs-corpus) LSH join is an equi hash join, never a cartesian") {
    import org.apache.spark.sql.functions._
    val docs = tables("documents")
    val pairs = graft.operators.Dedup.minHashPairsAgainst(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), threshold = 0.7)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    pairs.unpersist()
  }

  test("cross-entropy scoring broadcasts the LM; doc-side join never sort-merges") {
    val docs = tables("documents")
    val p = graft.operators.TextOps.crossEntropy(docs, docs, vocabK = 200)
      .queryExecution.executedPlan.toString
    // token join must be a broadcast hash join of the ≤vocabK-row LM
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // hash exchanges: LM token aggregation + per-doc aggregation only —
    // the corpus itself is never reshuffled for the join
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("training-shard assignment is one shuffle (shard exchange), window sort only") {
    val p = graft.operators.Packing.shardForTraining(tables("documents"), shards = 16)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dup-span detection is two shuffles (hash window + doc rollup), no join") {
    val p = graft.operators.TextOps.dupSpans(tables("documents"), n = 8)
      .queryExecution.executedPlan.toString
    // sharing count is a window frame over the hash, never a self-join
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("bm25 broadcasts the query side; the corpus is never nested-loop joined") {
    val spark2 = spark
    import spark2.implicits._
    val q = Seq(("q1", "spark window join")).toDF("query_id", "qtext")
    val p = graft.operators.TextOps.bm25(tables("documents"), q)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the only nested-loop allowed is the 1-row broadcast (N, avgdl) attach
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("urlParts and encodingFlags are scan-speed: one scan, no shuffle") {
    import org.apache.spark.sql.functions._
    val withUrl = tables("documents")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".com/a")))
    for (df <- Seq(graft.operators.WebOps.urlParts(withUrl),
        graft.operators.TextOps.encodingFlags(tables("documents")))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), p)
      assert("Scan parquet".r.findAllIn(p).size == 1, p)
      assert(!p.contains("Exchange"), p)
    }
  }

  test("domain blocklist filter broadcasts the blocklist, never shuffles the corpus") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val withUrl = tables("documents")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".com/a")))
    val p = graft.operators.WebOps.filterBlockedDomains(
        withUrl, Seq("src1.com").toDF("domain"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("token-budget mix broadcasts its rate table; snapshot diff never cartesians") {
    import org.apache.spark.sql.functions._
    val docs = tables("documents")
    val mix = graft.operators.Sampling.toTokenBudget(docs, col("source"),
      col("doc_id"), Map("src0" -> 0.5), totalTokens = 1000)
    val pm = mix.queryExecution.executedPlan.toString
    assert(pm.contains("BroadcastHashJoin"), pm)
    assert(!pm.contains("SortMergeJoin") && !pm.contains("CartesianProduct"), pm)
    val diff = graft.operators.Dedup.corpusDiff(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 3 === 0))
    val pd = diff.queryExecution.executedPlan.toString
    assert(!pd.contains("CartesianProduct") && !pd.contains("BroadcastNestedLoopJoin"), pd)
  }

  test("fitLinear's moment pass is one scan with partial aggregation, no row shuffle") {
    import org.apache.spark.sql.functions._
    // pin the plan of the aggregation fitLinear executes: the moments are
    // reduced map-side; the exchange moves ONE row per partition
    val d = tables("documents")
    val xs = Seq(lit(1.0), length(col("text")).cast("double"))
    val moments = (for (i <- xs.indices; j <- i until xs.size)
      yield sum(xs(i) * xs(j))) :+ sum(xs(1) * xs(1))
    val p = d.agg(moments.head, moments.tail: _*)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("heavy-hitter sketch never shuffles raw keys — one summary per partition moves") {
    import org.apache.spark.sql.functions._
    // Space-Saving partials reduce map-side (ObjectHashAggregate over the
    // typed buffer); the only exchange is the SinglePartition gather of
    // O(capacity) counters per partition — an Exchange hashpartitioning on
    // the key column would be the unbounded-key-space scale killer
    val d = tables("documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
    val p = graft.operators.Sketches.heavyHitters(d, col("token"), k = 10, capacity = 1000)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Exchange hashpartitioning(token"), p)
    assert(p.contains("Exchange SinglePartition"), p)
  }

  test("html extraction, blocklists, card redaction are scan-speed: no shuffle") {
    import org.apache.spark.sql.functions._
    val d = tables("documents")
      .withColumn("html", concat(lit("<p>"), col("text"), lit("</p>")))
    val kernels = Seq(
      graft.operators.HtmlOps.htmlStats(d),
      graft.operators.TextOps.filterBlockedWords(d, Seq("slow", "dup")),
      d.select(graft.operators.TextOps.blocklistPhraseHits(col("text"), Seq("a b")).as("x")),
      d.select(graft.operators.TextOps.redactCards(col("text")).as("x")),
      graft.operators.TextOps.splitSentences(d))
    kernels.foreach { k =>
      val p = k.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert("Scan parquet".r.findAllIn(p).size == 1, p)
    }
  }

  test("sort-free per-group sample: summary agg + broadcast semi-join, no sort, no row shuffle") {
    import org.apache.spark.sql.functions._
    val p = graft.operators.Sampling.perGroupAgg(
        tables("documents"), col("source"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    // the corpus side must not sort (that's the window variant's cost)
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // exchanges move only the O(#groups·k) summary side, never corpus rows:
    // group-key partial agg + the broadcast itself
    assert(!p.contains("Exchange hashpartitioning(doc_id"), p)
  }

  test("pageRank rounds never cartesian; contributions aggregate partially") {
    val e = tables("documents").selectExpr(
      "concat('h', doc_id % 13) AS src", "concat('h', doc_id % 17) AS dst").distinct()
    val p = graft.operators.Graphs.pageRank(e, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("WARC parse and byte proxy are scan-speed: one scan, no shuffle") {
    val warcFiles = tables("documents").selectExpr(
      "doc_id", "concat('WARC/1.0\r\nContent-Length: ', octet_length(text), '\r\n\r\n', text) AS content")
    val p1 = graft.sources.Ingest.warc(warcFiles, "content")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), p1)
    assert("Scan parquet".r.findAllIn(p1).size == 1, p1)
    val p2 = tables("documents")
      .select(graft.operators.Bpe.byteProxyText(org.apache.spark.sql.functions.col("text")))
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), p2)
  }

  test("interleave ranks a slim projection; the payload joins back by key only") {
    val df = graft.operators.Sampling.interleaveByWeight(
      tables("documents"), org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("doc_id"), Map("src1" -> 0.5, "src2" -> 0.5))
    val p = df.queryExecution.executedPlan.toString
    // the window's sort must read only (key, source)-derived columns: the
    // document text appears in NO Sort operator input
    val sortLines = p.linesIterator.filter(_.contains("Sort ")).mkString("\n")
    assert(!sortLines.contains("text"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("paragraph dedup: the election window never carries paragraph text") {
    val df = graft.operators.Dedup.dropDupParagraphs(tables("documents"))
    val p = df.queryExecution.executedPlan.toString
    val sortLines = p.linesIterator.filter(_.contains("Sort ")).mkString("\n")
    assert(!sortLines.contains("__para"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("fertility report: one scan into a partial-then-final hash aggregate, no window") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Bpe.fertilityReport(tables("documents"),
      graft.operators.TextOps.tokenCountBpe(col("text")),
      groupCols = Seq("source"))
    val p = df.queryExecution.executedPlan.toString
    // map-side combine must collapse the corpus before the one shuffle
    assert(p.contains("partial"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges:\n$p")
  }

  test("langSegments: no window; document text never rides an exchange") {
    val df = graft.operators.TextOps.langSegments(tables("documents"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the (id, lang) and (id) aggregates move only slim vote rows, and
    // the id-spine join carries ids: no full text column on any exchange
    val exLines = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exLines.contains("text"), p)
  }

  test("PQ scan: the query side broadcasts; codes come from one corpus scan") {
    val emb = tables("embeddings")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .withColumnRenamed("vec_id", "query_id")
    val df = graft.operators.Similarity.topKPq(emb, q, k = 5,
      m = 8, ksub = 16, iters = 0, rerank = 2)
    val p = df.queryExecution.executedPlan.toString
    // candidate generation is the broadcast cross of the tiny query side —
    // never a shuffled cartesian of the corpus
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("large-table BPE tokenize is ONE scan-stage kernel expression, no shuffle") {
    // a 1000-rank merge table must neither add an Exchange nor unroll
    // into nested aggregate() HOFs (the fold path stops being
    // analyzable/compilable at a few dozen ranks)
    val merges = (1 to 1000).map(i => (s"a$i", s"b$i"))
    val df = graft.operators.Bpe.tokenize(tables("documents"), merges)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("bpeSegment"), p)
  }

  test("PCA projection is one scan-stage kernel, no shuffle, no join") {
    val emb = tables("embeddings")
    val model = graft.operators.Similarity.pcaFit(emb, k = 4)
    val p = graft.operators.Similarity.pcaProject(emb, model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("DSIR scoring is a zero-join scan; zorderBy is exactly one range exchange") {
    val docs = tables("documents")
    val w = graft.operators.Sampling.importanceWeights(
      docs, docs.limit(100), buckets = 64)
    val pw = w.queryExecution.executedPlan.toString
    // the lambda table is a plan literal: scoring adds no join, no
    // exchange, and reads the corpus once
    assert(!pw.contains("Join") && !pw.contains("Exchange"), pw)
    assert("Scan parquet".r.findAllIn(pw).size == 1, pw)

    val laid = graft.operators.Packing.zorderBy(tables("lineitem"),
      Seq("l_partkey", "l_suppkey"), numParts = 4, keepKey = true)
    val pl = laid.queryExecution.executedPlan.toString
    assert(pl.contains("Exchange rangepartitioning"), pl)
    assert("Exchange".r.findAllIn(pl).size == 1, pl)
    assert(!pl.contains("Join"), pl)
  }

  test("topPaths: one event shuffle serves sessionize, step ranking and the session agg") {
    val ev = tables("events")
    val df = graft.operators.Events.topPaths(
      ev.select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("t"),
        org.apache.spark.sql.functions.col("event_type")),
      Seq("user_id"), "t", "event_type",
      gap = 1800000000L, tiebreak = "event_id", maxSteps = 4, k = 25)
    val p = df.queryExecution.executedPlan.toString
    // hashpartitioning(user_id) satisfies the (user_id, session_seq)
    // window AND the session groupBy by subset clustering, so the raw
    // event log shuffles exactly once; the remaining exchanges are the
    // census-sized count_distinct phases ((path, key) then (path))
    val ex = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.count(l => l.contains("user_id") && !l.contains("path")) == 1,
      s"event-sized exchanges != 1:\n$p")
    assert(ex.count(_.contains("session_seq")) == 0,
      s"derived-session re-shuffle present:\n$p")
    assert(ex.size <= 3, s"${ex.size} hash exchanges:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("sketch corpusOverlap never shuffle-joins the corpora") {
    val docs = tables("documents")
    val key = graft.operators.TextOps.normalize(
      org.apache.spark.sql.functions.col("text"))
    val p = graft.operators.Sketches.corpusOverlap(docs, docs, key, key)
      .queryExecution.executedPlan.toString
    // two independent sketch aggregations meet in a 1-row broadcast
    // cross — no sort-merge/shuffled-hash join, no hash exchange of keys
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
