package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded-memory sketch aggregations — the corpus-profiling tools that
  * survive unbounded key spaces. [[TextOps.vocab]]-style exact groupBy
  * aggregation is right when the key space is a (bounded) vocabulary; over
  * URLs, hostnames, high-order n-grams or user ids the distinct-key set
  * grows with the corpus and an exact groupBy shuffles ALL of it. These
  * operators cap state at a fixed budget per aggregation:
  *
  *  - [[heavyHitters]]: Space-Saving (Metwally et al. 2005) as a typed
  *    Spark `Aggregator` — O(capacity) state per partition, mergeable
  *    partial summaries (Agarwal et al., "Mergeable Summaries", PODS'12),
  *    deterministic tie-breaking. Exact when the key space fits the
  *    capacity; guaranteed over-estimates with a per-key error bound when
  *    it doesn't.
  *  - [[distinctByGroup]]: per-group HLL distinct-count sketches via
  *    Spark's built-in DataSketches functions (`hll_sketch_agg`), with the
  *    global count derived by MERGING the per-group sketches
  *    (`hll_union_agg`) instead of re-scanning the corpus — the pattern a
  *    100 TB profile job uses to get per-source and whole-corpus
  *    cardinalities from one pass.
  */
object Sketches {

  /** One Space-Saving counter: estimated count `est` over-estimates the
    * true count by at most `err` (true ∈ [est - err, est]). */
  private[operators] final case class SSEntry(key: String, est: Long, err: Long)

  /** Space-Saving summary with an indexed min-heap over counts so the
    * eviction path is O(log capacity) per row (the naive min scan makes
    * all-distinct streams quadratic in capacity). Plain JVM object inside
    * the aggregation; kryo-serialized only across the partial/merge
    * shuffle boundary. */
  private[operators] final class SSBuf(val capacity: Int) extends Serializable {
    // heap of (key, est, err) ordered by est asc; idx maps key -> heap slot
    val keys = new Array[String](capacity)
    val ests = new Array[Long](capacity)
    val errs = new Array[Long](capacity)
    var size = 0
    val idx = new java.util.HashMap[String, Integer]()

    private def swap(a: Int, b: Int): Unit = {
      val k = keys(a); keys(a) = keys(b); keys(b) = k
      val e = ests(a); ests(a) = ests(b); ests(b) = e
      val r = errs(a); errs(a) = errs(b); errs(b) = r
      idx.put(keys(a), a); idx.put(keys(b), b)
    }
    private def siftDown(i0: Int): Unit = {
      var i = i0
      var go = true
      while (go) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && ests(l) < ests(m)) m = l
        if (r < size && ests(r) < ests(m)) m = r
        if (m == i) go = false else { swap(i, m); i = m }
      }
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && ests((i - 1) / 2) > ests(i)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    /** Min estimated count in the summary (0 when not full — an absent key
      * then truly has count 0). */
    def minEst: Long = if (size < capacity) 0L else ests(0)

    def update(key: String, w: Long): Unit = {
      val at = idx.get(key)
      if (at != null) { ests(at) += w; siftDown(at) }
      else if (size < capacity) {
        keys(size) = key; ests(size) = w; errs(size) = 0L
        idx.put(key, size); size += 1; siftUp(size - 1)
      } else {
        // evict the min-count entry; the newcomer inherits its count as
        // both baseline and error bound (the Space-Saving invariant)
        idx.remove(keys(0))
        val base = ests(0)
        keys(0) = key; ests(0) = base + w; errs(0) = base
        idx.put(key, 0); siftDown(0)
      }
    }
    /** Insert with an explicit error term (merge path). */
    def updateWithErr(key: String, est: Long, err: Long): Unit = {
      val at = idx.get(key)
      if (at != null) { ests(at) += est; errs(at) += err; siftDown(at) }
      else if (size < capacity) {
        keys(size) = key; ests(size) = est; errs(size) = err
        idx.put(key, size); size += 1; siftUp(size - 1)
      } else if (est > ests(0)) {
        idx.remove(keys(0))
        keys(0) = key; ests(0) = est; errs(0) = err
        idx.put(key, 0); siftDown(0)
      }
    }
    def entries: Seq[SSEntry] =
      (0 until size).map(i => SSEntry(keys(i), ests(i), errs(i)))
  }

  /** Typed Space-Saving aggregator over (key, weight) rows. The merge
    * follows Mergeable Summaries: a key absent from one side could have
    * hidden under that side's minimum counter, so its count/error gain the
    * other side's `minEst` — estimates stay upper bounds and the
    * `est - err ≤ true ≤ est` invariant is preserved through arbitrary
    * partition/tree merges. */
  private[operators] final class SpaceSaving(capacity: Int)
      extends Aggregator[(String, Long), SSBuf, Seq[SSEntry]] {
    def zero: SSBuf = new SSBuf(capacity)
    def reduce(b: SSBuf, in: (String, Long)): SSBuf = {
      if (in._1 != null && in._2 > 0) b.update(in._1, in._2)
      b
    }
    def merge(a: SSBuf, b: SSBuf): SSBuf = {
      val minA = a.minEst; val minB = b.minEst
      val out = new SSBuf(capacity)
      // shared keys: sum counts and errors; one-sided keys: the other
      // side's min counter is both the max mass it could have hidden there
      // and the error that possibility adds
      (0 until a.size).foreach { i =>
        val k = a.keys(i)
        val at = b.idx.get(k)
        if (at != null)
          out.updateWithErr(k, a.ests(i) + b.ests(at), a.errs(i) + b.errs(at))
        else out.updateWithErr(k, a.ests(i) + minB, a.errs(i) + minB)
      }
      (0 until b.size).foreach { i =>
        val k = b.keys(i)
        if (a.idx.get(k) == null)
          out.updateWithErr(k, b.ests(i) + minA, b.errs(i) + minA)
      }
      out
    }
    def finish(b: SSBuf): Seq[SSEntry] =
      b.entries.sortBy(e => (-e.est, e.key))
    def bufferEncoder: Encoder[SSBuf] = Encoders.kryo[SSBuf]
    def outputEncoder: Encoder[Seq[SSEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
  }

  /** The Space-Saving aggregator as a reusable UDF — for callers that
    * need the summary inside their own aggregation (streaming complete
    * mode, grouped rollups, SQL registration): apply as
    * `agg(keyCol, weightCol)` → array of (key, est, err) structs sorted
    * est desc. Streaming state per group is ONE O(capacity) summary. */
  def heavyHittersAgg(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new SpaceSaving(capacity))

  /** Top-k heavy hitters of `keyCol` (optionally `weight`-weighted) with a
    * state budget of `capacity` counters per aggregation buffer — NOT a
    * per-key shuffle: partial summaries are built map-side and merged, so
    * the only thing that ever moves is O(capacity) counters per partition,
    * regardless of how many distinct keys the corpus holds.
    *
    * Exact (err = 0) whenever distinct keys ≤ capacity. Otherwise each
    * returned row guarantees `est - err ≤ true_count ≤ est`, and every key
    * with true count > total/capacity is guaranteed present (the
    * Space-Saving frequent-items guarantee).
    *
    * @return (key, est, err) — est desc, key asc, k rows */
  def heavyHitters(
      df: DataFrame,
      keyCol: Column,
      k: Int = 100,
      capacity: Int = 10000,
      weight: Column = lit(1L)): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val agg = udaf(new SpaceSaving(capacity))
    df.select(keyCol.cast("string").as("__k"), weight.cast("long").as("__w"))
      .agg(agg(col("__k"), col("__w")).as("__hh"))
      .select(explode(col("__hh")).as("__e"))
      .select(col("__e.key").as("key"), col("__e.est").as("est"),
        col("__e.err").as("err"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
  }

  /** Per-group heavy hitters with the same bounded-state contract: one
    * Space-Saving summary per group (e.g. top URLs per language). */
  def heavyHittersPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      keyCol: Column,
      k: Int = 100,
      capacity: Int = 10000,
      weight: Column = lit(1L)): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val agg = udaf(new SpaceSaving(capacity))
    val grouped = df
      .select((groupCols :+ keyCol.cast("string").as("__k") :+
        weight.cast("long").as("__w")): _*)
      .groupBy(groupCols: _*)
      .agg(agg(col("__k"), col("__w")).as("__hh"))
    val grpNames = grouped.columns.dropRight(1)
    // per-summary top-k needs no window shuffle: finish() returns each
    // group's summary sorted (est desc, key asc), so slicing the array is
    // the whole top-k
    grouped
      .select(grpNames.toIndexedSeq.map(col) :+
        explode(slice(col("__hh"), 1, k)).as("__e"): _*)
      .select(grpNames.toIndexedSeq.map(col) :+ col("__e.key").as("key") :+
        col("__e.est").as("est") :+ col("__e.err").as("err"): _*)
  }

  /** Per-group distinct-value cardinalities from ONE corpus pass, plus the
    * whole-corpus cardinality obtained by MERGING the per-group sketches —
    * never by re-scanning: the group rows carry their HLL sketch binaries,
    * and the `__total__` row is `hll_union_agg` over exactly those
    * sketches. At 100 TB this is the difference between one profile pass
    * and one per roll-up level.
    *
    * @param lgK DataSketches log2(K) accuracy knob (12 → ~2.5% rel. err)
    * @return (group, n_distinct) with one extra row group='__total__' */
  def distinctByGroup(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      lgK: Int = 12): DataFrame = {
    val perGroup = df
      .groupBy(groupCol.cast("string").as("group"))
      .agg(hll_sketch_agg(valueCol.cast("string"), lit(lgK)).as("__sk"))
      .persist() // two readers: the per-group rows and the union roll-up
    val out = perGroup
      .select(col("group"), hll_sketch_estimate(col("__sk")).as("n_distinct"))
      .unionAll(perGroup.agg(
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("n_distinct"))
        .select(lit("__total__").as("group"), col("n_distinct")))
    Dedup.materializeAndRelease(out, perGroup)
  }

  // --------------------------------------------------------- count-min

  /** Count-min sketch cells over an unbounded key space: `depth` rows ×
    * `width` buckets, hash_i(key) = portable md5 hash of "i:key" mod
    * width — the frequency-table complement of [[heavyHitters]] (that one
    * finds the top keys; this one answers "how often is ANY key" in fixed
    * memory). Point estimates ([[countMinQuery]]) are min over the key's
    * depth cells: always ≥ the true count, ≤ true + N/width w.h.p.
    *
    * Build is one partial-agg groupBy on (row, bucket) — map-side combine
    * collapses to at most depth·width cells per partition, so the shuffle
    * is sketch-sized, never corpus-sized. Cells from different corpus
    * shards ADD (sum on (row, bucket)) — the merge a daily ingest needs.
    * The md5 hash family makes every cell and every estimate exactly
    * replayable by an ANSI engine. Missing cells mean zero. */
  def countMin(df: DataFrame, key: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    df.select(key.cast("string").as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", pmod(TextOps.portableHash60(
        concat(col("row").cast("string"), lit(":"), col("__k"))), lit(width)))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** MinHash-LSH banding planner — the audit table to read BEFORE running
    * a corpus-sized dedup: for every (bands, rows) split of a k-position
    * signature, the candidate probability p(j) = 1 − (1 − j^rows)^bands at
    * the target Jaccard threshold, at threshold−0.2 (false-candidate
    * cost: each unit of p there multiplies the verify-join fanout), and
    * at threshold+0.1 (recall near misses). Pure arithmetic on a k-row
    * range — no data touched; rounded to 4 dp so pow() replay differences
    * in the last ulp cannot flip a digit. */
  def lshPlan(spark: org.apache.spark.sql.SparkSession,
      k: Int = 64, threshold: Double = 0.7): DataFrame = {
    require(k >= 1 && threshold > 0 && threshold < 1, "bad k/threshold")
    def p(j: Double) = round(lit(1.0) -
      pow(lit(1.0) - pow(lit(j), col("rows_per_band")), col("bands")), 4)
    spark.range(1, k + 1L).toDF("rows_per_band")
      .withColumn("rows_per_band", col("rows_per_band").cast("int"))
      .withColumn("bands", (lit(k) / col("rows_per_band")).cast("int"))
      .withColumn("positions_used", col("bands") * col("rows_per_band"))
      .withColumn("p_at_threshold", p(threshold))
      .withColumn("p_below", p(math.max(threshold - 0.2, 0.0)))
      .withColumn("p_above", p(math.min(threshold + 0.1, 1.0)))
  }

  /** Corpus-membership overlap audit of two key sets — |A|, |B|, |A∪B|,
    * |A∩B|, Jaccard and both containments in ONE row, without ever
    * joining the corpora.
    *
    * Default (sketch) path: one `hll_sketch_agg` pass per side (map-side
    * partials, a few KB per partition on the wire), union the two
    * sketches, intersection by inclusion–exclusion — the right shape for
    * "how much of crawl B did we already have in A?" at 100 TB, where an
    * exact distinct-key join is a corpus-sized shuffle. `exact = true`
    * computes the same row exactly with one hash shuffle of the distinct
    * keys (the oracle-checked mode; flags fold in the same exchange the
    * distinct already needs). NULL keys are ignored on both sides.
    * Estimates can make `n_a + n_b − n_union` slightly negative on
    * near-disjoint sets; the intersection clamps at 0. */
  def corpusOverlap(
      a: DataFrame,
      b: DataFrame,
      keyA: Column,
      keyB: Column,
      exact: Boolean = false,
      lgK: Int = 14): DataFrame = {
    def out(nA: Column, nB: Column, nU: Column, nI: Column) = {
      def ratio(num: Column, den: Column) =
        round(when(den > 0, num.cast("double") / den).otherwise(lit(0.0)), 6)
      Seq(nA.as("n_a"), nB.as("n_b"), nU.as("n_union"), nI.as("n_intersect"),
        ratio(nI, nU).as("jaccard"),
        ratio(nI, nA).as("containment_a"),
        ratio(nI, nB).as("containment_b"))
    }
    if (exact) {
      val ka = a.select(keyA.cast("string").as("k"))
        .where(col("k").isNotNull)
        .select(col("k"), lit(1).as("ia"), lit(0).as("ib"))
      val kb = b.select(keyB.cast("string").as("k"))
        .where(col("k").isNotNull)
        .select(col("k"), lit(0).as("ia"), lit(1).as("ib"))
      val merged = ka.union(kb).groupBy("k")
        .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      val nA = coalesce(sum(col("ia")), lit(0L)).cast("long")
      val nB = coalesce(sum(col("ib")), lit(0L)).cast("long")
      val nU = count(lit(1))
      val nI = coalesce(sum(col("ia") * col("ib")), lit(0L)).cast("long")
      merged.agg(nA.as("__a"), nB.as("__b"), nU.as("__u"), nI.as("__i"))
        .select(out(col("__a"), col("__b"), col("__u"), col("__i")): _*)
    } else {
      val sa = a.agg(
        hll_sketch_agg(keyA.cast("string"), lit(lgK)).as("sa"))
      val sb = b.agg(
        hll_sketch_agg(keyB.cast("string"), lit(lgK)).as("sb"))
      // an EMPTY side aggregates to a NULL sketch; exact mode reports
      // zeros there, so coalesce estimates (and route the union around
      // the null sketch) to keep the two documented-equivalent modes
      // equivalent
      val nA = coalesce(hll_sketch_estimate(col("sa")), lit(0L))
      val nB = coalesce(hll_sketch_estimate(col("sb")), lit(0L))
      val nU = when(col("sa").isNull && col("sb").isNull, lit(0L))
        .when(col("sa").isNull, nB)
        .when(col("sb").isNull, nA)
        .otherwise(hll_sketch_estimate(
          hll_union(col("sa"), col("sb"), allowDifferentLgConfigK = false)))
      sa.crossJoin(sb)
        .select(nA.as("__a"), nB.as("__b"), nU.as("__u"))
        .select(out(col("__a"), col("__b"), col("__u"),
          greatest(lit(0L), col("__a") + col("__b") - col("__u"))): _*)
    }
  }

  /** Point-frequency estimates from a [[countMin]] cell table: each key
    * hashes to its depth cells, missing cells count zero, the estimate is
    * the min. The sketch side is at most depth·width rows — broadcast. */
  def countMinQuery(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    keys.select(keys.columns.map(col) :+
        explode(sequence(lit(0), lit(depth - 1))).as("row"): _*)
      .withColumn("bucket", pmod(TextOps.portableHash60(
        concat(col("row").cast("string"), lit(":"), key.cast("string"))),
        lit(width)))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
