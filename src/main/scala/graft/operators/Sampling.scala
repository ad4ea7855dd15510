package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Deterministic sampling operators for large-scale training-data pipelines.
  *
  * All variants key off a content/id hash instead of an RNG so that a
  * sample is (a) reproducible run-over-run, (b) consistent across a
  * resharded 100 TB corpus (membership depends only on the row, never on
  * partitioning), and (c) exactly replayable by any engine with md5 —
  * which is what makes the DuckDB oracle possible. Pure Column
  * expressions: no shuffle, no state, scan-speed.
  *
  * (The reference has no sampling surface; this is part of the
  * LLM-pipeline extension set, SURVEY §7 M7.)
  */
object Sampling {

  /** Uniform bucket in [0, 10000) derived from the key's md5 — the
    * portable equivalent of `('0x'||substr(md5(k),1,15))::BIGINT % 10000`. */
  def hashBucket(key: Column): Column =
    TextOps.portableHash60(key.cast("string")) % 10000

  /** Keep ~`rate` of rows (0..1), deterministically by key. */
  def byHash(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashBucket(key) < lit((rate * 10000).toInt))

  /** Per-stratum rates: rows in strata absent from `rates` are dropped. */
  def stratified(
      df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(0)) { case (acc, (s, r)) =>
      when(stratum === s, lit((r * 10000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(key) < threshold)
  }

  /** Disjoint train/validation/test-style splits by cumulative weight.
    * Returns the frame with a `split` label column; weights need not sum
    * to 1 (the remainder is labeled null and can be filtered).
    *
    * Leakage note: the bucket derives from `key`, and every row with the
    * same key lands in the same split — so pass the GROUP identity when
    * rows are correlated (the near-dup cluster label from
    * [[Dedup.connectedComponents]], a conversation/session id, a
    * registered domain), not the row id: a cluster straddling train and
    * test is train→test leakage a per-row split cannot prevent. */
  def split(df: DataFrame, key: Column, weights: Seq[(String, Double)],
      labelCol: String = "split"): DataFrame = {
    val b = hashBucket(key)
    val (expr, _) = weights.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cum), (label, w)) =>
        val hi = cum + w
        val branch = when(b >= lit((cum * 10000).toInt) && b < lit((hi * 10000).toInt), label)
        (coalesce(acc, branch), hi)
    }
    df.withColumn(labelCol, expr)
  }

  /** At most `k` rows per group, chosen by hash order (a deterministic
    * reservoir): one shuffle on the group key, rank by the key hash. */
  def perGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(TextOps.portableHash60(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }

  /** Bounded max-heap of the k smallest (hash, key) pairs, deduped by
    * key (a key's rows can reach several partials). Same shape as
    * [[Sketches.SSBuf]]: plain JVM object inside the aggregation, kryo
    * across the partial/merge boundary. */
  private[operators] final class MinKBuf(val k: Int) extends Serializable {
    val hs = new Array[Long](k)
    val ks = new Array[String](k)
    var size = 0
    val idx = new java.util.HashMap[String, Integer]()
    private def lt(h1: Long, k1: String, h2: Long, k2: String): Boolean =
      h1 < h2 || (h1 == h2 && k1 < k2)
    private def swap(a: Int, b: Int): Unit = {
      val h = hs(a); hs(a) = hs(b); hs(b) = h
      val s = ks(a); ks(a) = ks(b); ks(b) = s
      idx.put(ks(a), a); idx.put(ks(b), b)
    }
    private def siftDown(i0: Int): Unit = {
      var i = i0; var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < size && lt(hs(m), ks(m), hs(l), ks(l))) m = l
        if (r < size && lt(hs(m), ks(m), hs(r), ks(r))) m = r
        if (m == i) go = false else { swap(i, m); i = m }
      }
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && lt(hs((i - 1) / 2), ks((i - 1) / 2), hs(i), ks(i))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    def offer(h: Long, key: String): Unit = {
      if (key == null || idx.containsKey(key)) return
      if (size < k) {
        hs(size) = h; ks(size) = key; idx.put(key, size)
        size += 1; siftUp(size - 1)
      } else if (lt(h, key, hs(0), ks(0))) {
        idx.remove(ks(0))
        hs(0) = h; ks(0) = key; idx.put(key, 0); siftDown(0)
      }
    }
    def entries: Seq[String] =
      (0 until size).sortBy(i => (hs(i), ks(i))).map(ks)
  }

  /** Typed min-k-by-hash aggregator over (hash, key) pairs — the
    * mergeable-summary form of a deterministic k-reservoir. */
  private[operators] final class MinKByHash(k: Int)
      extends Aggregator[(Long, String), MinKBuf, Seq[String]] {
    def zero: MinKBuf = new MinKBuf(k)
    def reduce(b: MinKBuf, in: (Long, String)): MinKBuf = { b.offer(in._1, in._2); b }
    def merge(a: MinKBuf, b: MinKBuf): MinKBuf = {
      (0 until b.size).foreach(i => a.offer(b.hs(i), b.ks(i)))
      a
    }
    def finish(b: MinKBuf): Seq[String] = b.entries
    def bufferEncoder: Encoder[MinKBuf] = Encoders.kryo[MinKBuf]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** [[perGroup]] without the sort: the window variant ranks by sorting
    * every group's rows (a full sort shuffle — the skewed-group killer at
    * corpus scale); this one folds each partition into an O(k) mergeable
    * min-k-by-hash summary (map-side partials, only k keys per group ever
    * shuffle), then keeps the sampled keys via a broadcast semi-join
    * (#groups × k keys — tiny next to the corpus). Identical output to
    * [[perGroup]] when `key` is unique within its group (the id-sampling
    * case; differential-tested); with duplicate keys this keeps every row
    * of a sampled key whereas the window keeps exactly k rows. */
  def perGroupAgg(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val pick = udaf(new MinKByHash(k))
    val keyStr = key.cast("string")
    val picked = df
      .groupBy(group.as("__g"))
      .agg(pick(TextOps.portableHash60(keyStr), keyStr).as("__ks"))
      .select(col("__g"), explode(col("__ks")).as("__key"))
    df.join(broadcast(picked),
      group <=> col("__g") && keyStr === col("__key"), "left_semi")
  }

  /** Temperature-based mixture resampling — the standard pretraining
    * domain-rebalance (multilingual-T5-style, tau < 1 upweights tails):
    * with p_g the group's natural share, the kept sample follows
    * q_g ∝ p_g^tau, realized as the maximal subsample (no upsampling) by
    * per-group keep rate r_g = (c_g / c_min)^(tau-1), capped at 1 for the
    * smallest group.
    *
    * Plan at scale: one partial-agg groupBy over the corpus → a #groups-row
    * rate table → broadcast back onto the scan → hash filter. Nothing ever
    * materializes on the driver. The rate is rounded to 6 digits before the
    * 10000-bucket threshold so the DuckDB oracle replays the same floor.
    * Output carries `mix_rate` for auditability. */
  def temperatureMixture(
      df: DataFrame, group: Column, key: Column, tau: Double): DataFrame = {
    val counts = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = counts
      .withColumn("__rate",
        round(pow(col("__cnt").cast("double") / min("__cnt").over(w), tau - 1), 6))
      .select(col("__g"), col("__rate"))
    df.join(broadcast(rates), group <=> col("__g")) // null-safe: a NULL group is its own group
      .filter(hashBucket(key) < floor(col("__rate") * 10000))
      .withColumn("mix_rate", col("__rate"))
      .drop("__g", "__rate")
  }

  /** Token-budget mixture — the "hit the data-mix spec" sampler: given
    * target token fractions per group (a Llama/GPT-style mix table) and a
    * total token budget, downsample each group to its share. Group g with
    * corpus tokens T_g and target share f_g keeps rate
    * r_g = min(1, f_g·budget / T_g) — in expectation the kept tokens match
    * the spec (no upsampling: a group smaller than its target contributes
    * everything it has — check `mix_rate` = 1 rows to find starved
    * groups). Groups absent from `fracs` are dropped.
    *
    * Same 100 TB shape as [[temperatureMixture]]: one partial-agg groupBy
    * for the per-group token totals → tiny rate table → broadcast hash
    * filter on the scan; deterministic by `key`. */
  def toTokenBudget(
      df: DataFrame,
      group: Column,
      key: Column,
      fracs: Map[String, Double],
      totalTokens: Long,
      textCol: String = "text"): DataFrame = {
    require(totalTokens > 0 && fracs.values.forall(_ >= 0), "bad budget/fracs")
    val toks = TextOps.tokenCount(col(textCol))
    val totals = df.groupBy(group.as("__g")).agg(sum(toks).as("__toks"))
    val target = fracs.foldLeft(lit(0.0)) { case (acc, (g, f)) =>
      when(col("__g") === g, lit(f * totalTokens)).otherwise(acc)
    }
    val rates = totals
      .withColumn("__rate",
        round(least(lit(1.0), target / col("__toks")), 6))
      .select(col("__g"), col("__rate"))
    df.join(broadcast(rates), group <=> col("__g")) // null-safe: NULL group is its own group
      .filter(hashBucket(key) < floor(col("__rate") * 10000))
      .withColumn("mix_rate", col("__rate"))
      .drop("__g", "__rate")
  }

  /** Per-domain mixture PLAN — the audit table a data-recipe review reads
    * before materializing anything: each group's corpus doc/token totals,
    * the target token count its `fracs` share of `budget` implies, and the
    * sampling rate `min(maxEpochs, target / avail)` the materializer will
    * apply. Rate > 1 means the domain repeats across epochs (the
    * scarce-high-quality-corpus upsampling every published LLM mix uses);
    * a domain pinned at `rate = maxEpochs` is visibly starved — its
    * `planned_tokens` (expected realized tokens, `round(rate·avail)`)
    * falls short of `target_tokens` and the recipe needs more source data
    * or a rebalance. Groups absent from `fracs` plan at rate 0.
    *
    * One partial-agg groupBy → #groups rows; nothing scales with corpus
    * size.
    *
    * @return (grp, n_docs, avail_tokens, frac, target_tokens, rate,
    *         planned_tokens) */
  def mixturePlan(
      df: DataFrame,
      group: Column,
      fracs: Map[String, Double],
      totalTokens: Long,
      maxEpochs: Double = 10.0,
      textCol: String = "text"): DataFrame = {
    require(totalTokens > 0 && maxEpochs > 0 && fracs.values.forall(_ >= 0),
      "bad budget/maxEpochs/fracs")
    val frac = fracs.foldLeft(lit(0.0)) { case (acc, (g, f)) =>
      when(col("grp") === g, lit(f)).otherwise(acc)
    }
    df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("avail_tokens"))
      .withColumn("frac", frac)
      .withColumn("target_tokens",
        round(col("frac") * totalTokens).cast("long"))
      .withColumn("rate", round(least(lit(maxEpochs),
        col("frac") * totalTokens / col("avail_tokens")), 6))
      .withColumn("planned_tokens",
        round(col("rate") * col("avail_tokens")).cast("long"))
  }

  /** Epoch-aware mixture MATERIALIZATION — the upsampling complement of
    * [[toTokenBudget]]: group g with corpus tokens T_g and target share
    * f_g replicates at rate r_g = min(maxEpochs, f_g·budget / T_g). Every
    * row emits copies for epochs 0..floor(r)-1, plus the partial epoch
    * floor(r) when its hash bucket falls under the fractional remainder —
    * so a rate-2.3 domain materializes two full passes and a fixed,
    * deterministic 30% subset as the third. Rates < 1 degrade to exactly
    * [[toTokenBudget]]'s downsampling (epoch 0, hash-kept). Output carries
    * `epoch` and `mix_rate` for auditability; groups absent from `fracs`
    * drop.
    *
    * Plan at scale: one partial-agg token-total groupBy → tiny rate table
    * broadcast onto the scan → per-row bounded `sequence` explode
    * (fanout ≤ ceil(maxEpochs)). No shuffle, no driver state; membership
    * of the partial epoch depends only on the row's key, never on
    * partitioning. */
  def epochMixture(
      df: DataFrame,
      group: Column,
      key: Column,
      fracs: Map[String, Double],
      totalTokens: Long,
      maxEpochs: Double = 10.0,
      textCol: String = "text"): DataFrame = {
    require(totalTokens > 0 && maxEpochs > 0 && fracs.values.forall(_ >= 0),
      "bad budget/maxEpochs/fracs")
    val toks = TextOps.tokenCount(col(textCol))
    val totals = df.groupBy(group.as("__g")).agg(sum(toks).as("__toks"))
    val target = fracs.foldLeft(lit(0.0)) { case (acc, (g, f)) =>
      when(col("__g") === g, lit(f * totalTokens)).otherwise(acc)
    }
    val rates = totals
      .withColumn("__rate",
        round(least(lit(maxEpochs), target / col("__toks")), 6))
      .select(col("__g"), col("__rate"))
    val full = floor(col("__rate")).cast("int")
    val part = when(
      hashBucket(key) < floor((col("__rate") - full) * 10000), 1).otherwise(0)
    val copies = (full + part).cast("int")
    df.join(broadcast(rates), group <=> col("__g")) // null-safe: NULL group is its own group
      .withColumn("epoch", explode(when(copies > 0,
        sequence(lit(0), copies - 1)).otherwise(array().cast("array<int>"))))
      .withColumn("mix_rate", col("__rate"))
      .drop("__g", "__rate")
  }

  /** Quantile bucketing by a score column (perplexity-bucket sampling
    * prep): rows gain `score_bucket` = 1..probs.size+1, the interval of
    * the score between consecutive quantile thresholds (bucket i wins when
    * thr_(i-1) < score ≤ thr_i). Compose with [[stratified]] or
    * [[temperatureMixture]] on the bucket label to resample by quality
    * band.
    *
    * `exact = true` uses Catalyst's exact `percentile` (replayable by an
    * ANSI oracle via quantile_cont — both linearly interpolate at
    * p·(n-1)); the default approximate path uses the mergeable
    * `percentile_approx` sketch, whose partial aggregation is the 100 TB
    * shape (exact percentile buffers per-partition value multisets). Either
    * way the threshold vector is ONE tiny row broadcast back onto the scan
    * (a 1-row nested-loop join is a scalar subquery, not a scale risk). */
  def scoreBuckets(
      df: DataFrame, score: Column, probs: Seq[Double],
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "probs must be quantiles strictly inside (0, 1)")
    require(probs == probs.sorted, "probs must be ascending")
    val parr = array(probs.map(lit): _*)
    // exact mode: Profile.ExactQuantiles — same interpolation as the
    // builtin `percentile`, primitive buffers (see its scaladoc)
    val exactQ = udaf(new Profile.ExactQuantiles(probs.toArray))
    val thrAgg: Column =
      if (exact) exactQ(score.cast("double"))
      else percentile_approx(score, parr, lit(accuracy))
    val thr = df.agg(thrAgg.cast("array<double>").as("__thr"))
    df.crossJoin(broadcast(thr))
      .withColumn("score_bucket",
        (lit(1) + size(filter(col("__thr"), t => t < score))).cast("int"))
      .drop("__thr")
  }

  /** Deterministic weighted interleave — the consumption ORDER a training
    * data loader draws when the mixture is not materialized up front:
    * source g with weight w contributes its r-th item at virtual time
    * (r − 0.5) / w (stride scheduling), so EVERY prefix of the vtime order
    * realizes the sources in proportion to their weights — no RNG, and the
    * order is reproducible from (source, key) alone regardless of
    * partitioning.
    *
    * Emits `pos_in_source` (1-based rank by portable key hash within the
    * source — seed-stable shuffling, not input order) and `vtime` (rounded
    * to 6 dp so an ANSI replay agrees exactly). Consume by range-partition
    * + sort on (vtime, source, key) — the distributed sort Spark does
    * well — or key [[graft.operators.Packing.shardForTraining]] off
    * floor(vtime) for sequential shards. Sources absent from `weights`
    * drop (weight 0 = drop).
    *
    * Scale shape: the per-source rank window runs on a SLIM (key, source)
    * projection and the result joins back on the unique key — the payload
    * never rides the per-source sort (the packSequences lesson). `key`
    * must be unique (a doc id). */
  def interleaveByWeight(
      df: DataFrame,
      source: Column,
      key: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = weights.foldLeft(lit(0.0)) { case (acc, (g, wt)) =>
      when(col("__src") === g, lit(wt)).otherwise(acc)
    }
    val win = Window.partitionBy(col("__src"))
      .orderBy(TextOps.portableHash60(col("__k").cast("string")), col("__k"))
    val ranked = df.select(key.as("__k"), source.as("__src"))
      .withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("pos_in_source", row_number().over(win))
      .withColumn("vtime",
        round((col("pos_in_source") - lit(0.5)) / col("__w"), 6))
      .drop("__w")
    df.join(ranked, key === col("__k")).drop("__k", "__src")
  }

  // ------------------------------------------- DSIR importance selection

  /** Hashed n-gram buckets of a document: NON-distinct word unigrams and
    * bigrams of the normalized text (every occurrence counts — this is a
    * frequency featurization, not a set sketch), each mapped to
    * `[0, buckets)` by the portable 60-bit md5 hash. Empty grams (blank
    * documents normalize to "") are dropped. */
  private def gramBuckets(text: Column, buckets: Int): Column =
    // ONE compiled pass (r14): the HOF form materialized two gram
    // arrays + concat + filter + a UTF8String per gram before hashing;
    // the kernel hashes word slices in place (spec-pinned equal,
    // including the unigrams-then-bigrams order)
    graft.functions.TextKernels.dsirGramBucketsCol(
      TextOps.normalize(text), buckets, portable = true)

  /** Add-`alpha`-smoothed log-probability per hash bucket for one corpus:
    * ln((cntᵦ + α) / (total + α·B)). ONE bounded-key aggregation — at
    * most `buckets` distinct keys regardless of corpus size, so partial
    * aggregation reduces a 100 TB scan to a B-row table collected to the
    * driver. */
  private def bucketLogProbs(
      df: DataFrame, textCol: String, buckets: Int,
      alpha: Double): Array[Double] = {
    val rows = df
      .select(explode(gramBuckets(col(textCol), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect()
    val cnt = new Array[Long](buckets)
    rows.foreach(r => cnt(r.getInt(0)) = r.getLong(1))
    val total = cnt.sum.toDouble
    cnt.map(c => math.log((c + alpha) / (total + alpha * buckets)))
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every raw document by how much more likely
    * its hashed n-gram features are under the TARGET domain than under
    * the raw corpus —
    * `Σ_grams [ln p_target(bucket) − ln p_raw(bucket)]`, with
    * add-`alpha`-smoothed bucket distributions fit on each side.
    *
    * Scale shape: two bounded-key census aggregations (each collapses to
    * ≤ `buckets` rows before anything crosses the wire) fit the model;
    * the per-bucket log-ratio table ships back into the scan as ONE
    * plan-time literal array, so scoring is a single pass over the raw
    * corpus with zero joins and zero shuffles — md5 hashing of the grams
    * dominates the cost, exactly like every other hashed featurizer
    * here. Adds `n_grams` and `outCol` to the raw rows. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = 4096,
      alpha: Double = 1.0,
      outCol: String = "dsir_score"): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    require(alpha > 0, "alpha must be positive (unsmoothed ratios diverge)")
    val pT = bucketLogProbs(target, textCol, buckets, alpha)
    val pR = bucketLogProbs(raw, textCol, buckets, alpha)
    val lam = pT.indices.map(i => pT(i) - pR(i))
    // fused scoring kernel (r14): hash + lambda-sum in one compiled pass,
    // no intermediate bucket array, no interpreted fold; summation order
    // (gram order) is preserved, so doubles are bit-identical
    val tmp = Iterator.iterate("__dsir")(_ + "_")
      .dropWhile(raw.columns.contains).next()
    raw
      .withColumn(tmp, graft.functions.TextKernels.dsirScoreCol(
        TextOps.normalize(col(textCol)), lam, buckets, portable = true))
      .withColumn("n_grams", col(tmp).getField("n_grams"))
      .withColumn(outCol, col(tmp).getField("score"))
      .drop(tmp)
  }

  /** Weighted sampling WITHOUT replacement via the Gumbel top-k trick
    * (Efraimidis–Spirakis reservoir equivalently): keep the k rows with
    * the largest `logWeight + Gumbel(0,1)` — each row's selection
    * probability is proportional to exp(logWeight), exactly, without a
    * normalizing pass. The noise is DERIVED, not random: u from the
    * portable md5 hash of (seed, id), g = −ln(−ln(u)) — so the sample is
    * reproducible run-over-run, resharding-proof, engine-replayable (the
    * repo-wide determinism contract), and re-seedable for fresh draws.
    * Keys quantize to 1e-6 before ranking (ties then break on the id),
    * and the rank is a top-k TakeOrderedAndProject: one scan,
    * per-partition heaps, never a global sort. This is the resampling
    * step the DSIR paper puts after [[importanceWeights]] — pass the
    * dsir_score as the log-weight. */
  def gumbelTopK(
      df: DataFrame,
      logWeight: Column,
      k: Int,
      idCol: String = "doc_id",
      seed: Long = 42L,
      keyCol: String = "sample_key"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (pmod(TextOps.portableHash60(
        concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
      lit(1000000L)).cast("double") + 0.5) / 1000000.0
    df.withColumn(keyCol, round(logWeight - log(-log(u)), 6))
      .orderBy(col(keyCol).desc, col(idCol))
      .limit(k)
  }

  /** The DSIR selection step: keep the `k` raw documents with the highest
    * importance weight. Scores are quantized to 1e-6 before ranking (ties
    * then break on the id), which makes the selected set reproducible
    * across engines, partitionings and re-runs — the same fixed-point
    * trick the PQ scorer uses. The rank is a top-k
    * (TakeOrderedAndProject: per-partition heaps, never a global sort).
    * The paper resamples with Gumbel noise for diversity; a deterministic
    * pipeline wants the argmax variant, and callers who need the
    * resampling can add seeded noise to `dsir_score` before ranking. */
  def selectByImportance(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    importanceWeights(raw, target, textCol, buckets, alpha)
      .withColumn("__r", round(col("dsir_score"), 6))
      .orderBy(col("__r").desc, col(idCol))
      .limit(k)
      .drop("__r")
  }
}
