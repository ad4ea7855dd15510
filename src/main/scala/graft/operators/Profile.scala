package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table audit — the "what did we actually ingest" report run before any
  * curation decision (row counts, null rates, cardinalities, ranges, one
  * row per column). The reference's scope starts at clean rows; at corpus
  * scale the profile IS the first query, so it is built as one
  * whole-table aggregation pass: every statistic for every column is
  * computed in a single `agg` (map-side partial combine, one tiny global
  * reduce), then the 1×(5k+1) result row is unpivoted to k rows with a
  * zero-cost explode. No per-column scans, no collect.
  *
  * `exactDistinct = false` (default, the 100 TB path) uses
  * `approx_count_distinct` (HLL++, mergeable, single-pass for ALL columns
  * together). `true` switches to exact `count(DISTINCT)` — Catalyst plans
  * the multi-distinct agg via Expand, ~one pass per distinct column, so
  * reserve it for small tables and oracles. */
object Profile {

  /** Top-level key census of a JSON-string column — the JSONL corpus
    * audit before any schema is imposed: which keys exist, in how many
    * rows, and what fraction of the batch that is. Rows that are not a
    * JSON object — or are the empty object — surface as the NULL key
    * (invalid input is a row in the audit, not a dropped row). One
    * explode + one partial-agg shuffle
    * over a key-sized space; the batch total rides a broadcast
    * one-row aggregate, no driver action. */
  def jsonKeyCensus(
      docs: DataFrame, jsonCol: String = "json"): DataFrame = {
    val keys = docs.select(
      explode_outer(json_object_keys(col(jsonCol))).as("key"))
    val total = docs.agg(count(lit(1)).as("__total"))
    keys.groupBy("key")
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .withColumn("frac", round(col("n_docs") / col("__total"), 6))
      .drop("__total")
  }

  /** One row per profiled column: `col_name`, `n_rows`, `n_nulls`,
    * `n_distinct`, `min`, `max` (rendered as strings — min/max are
    * computed on the native type, THEN cast, so numeric columns do not
    * get lexicographic bounds), and `mean` (numeric columns only). */
  def profile(
      df: DataFrame,
      cols: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame =
    profileBy(df, Nil, cols, exactDistinct)

  /** [[profile]] per group: one row per (group, column) — the per-source /
    * per-language corpus-health slice. Same single-aggregation shape,
    * keyed on `by` (one partial-agg shuffle on the group columns; the
    * group cardinality, not the corpus, bounds the result). */
  def profileBy(
      df: DataFrame,
      by: Seq[String],
      cols: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols else df.columns.toSeq.filterNot(by.contains)
    require(targets.nonEmpty, "nothing to profile")
    val aggs: Seq[Column] = targets.flatMap { c =>
      val x = col(c)
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(x).as(s"__cnt_$c"),
        (if (exactDistinct) count_distinct(x) else approx_count_distinct(x))
          .cast("long").as(s"__dist_$c"),
        min(x).cast("string").as(s"__min_$c"),
        max(x).cast("string").as(s"__max_$c"),
        (if (isNum) round(avg(x.cast("double")), 6)
         else lit(null).cast("double")).as(s"__avg_$c"))
    } :+ count(lit(1)).as("__rows")
    val row =
      if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val pieces = targets.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__avg_$c").as("mean"))
    }
    row.select(by.map(col) :+ explode(array(pieces: _*)).as("p"): _*)
      .select(by.map(col) :+ col("p.*"): _*)
  }

  /** Equi-width histogram of a numeric column over an EXPLICIT [lo, hi)
    * range — bounds are caller-supplied so the histogram is one pass (a
    * min/max pre-pass at 100 TB is a second full scan; take bounds from
    * [[profile]], which already computed them). Values below `lo` clamp
    * into bin 0, `hi` and above into the last bin, NULLs drop. Returns
    * (bin, bin_lo, bin_hi, n) with empty bins present (count 0) so the
    * shape is plot-ready. One partial-agg shuffle of at most `bins`
    * groups, then a broadcast join onto the static bin table. */
  def histogram(
      df: DataFrame,
      column: Column,
      bins: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 1 && bins <= 100000, "bins must be in [1, 100000]")
    require(lo < hi, "need lo < hi")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((column.cast("double") - lo) / w).cast("int"), lit(0)), lit(bins - 1))
    val counts = df.filter(column.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val all = spark.range(bins).select(
      col("id").cast("int").as("bin"),
      round(lit(lo) + col("id") * w, 6).as("bin_lo"),
      round(lit(lo) + (col("id") + 1) * w, 6).as("bin_hi"))
    all.join(counts, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-group quantile report of a numeric column: one row per
    * (group, p) with the interpolated quantile — the latency/length/score
    * distribution slice next to [[profileBy]]. Default is the mergeable
    * `percentile_approx` sketch (one pass, map-side partials — the
    * 100 TB path); `exact = true` switches to the exact interpolated
    * percentile for small tables and the oracle. */
  def quantilesBy(
      df: DataFrame,
      by: Seq[String],
      column: Column,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99),
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps in [0,1]")
    val arr = array(ps.map(lit): _*)
    // exact mode: the primitive-buffer [[ExactQuantiles]] aggregator
    // (identical interpolation to the builtin — see its scaladoc)
    val exactQ = udaf(new ExactQuantiles(ps.toArray))
    val agg = (if (exact) exactQ(column.cast("double"))
               else percentile_approx(column, arr, lit(accuracy))).as("__q")
    val g =
      if (by.isEmpty) df.agg(agg)
      else df.groupBy(by.map(col): _*).agg(agg)
    g.select(by.map(col) :+ posexplode(col("__q")).as(Seq("__i", "value")): _*)
      .select(by.map(col) ++ Seq(
        element_at(arr, col("__i") + 1).as("p"),
        round(col("value"), 6).as("value")): _*)
  }

  /** Population-Stability-Index drift between two snapshots of numeric
    * columns — the distributional complement of [[driftReport]] (which
    * only sees mean/null shifts; PSI catches a variance blow-up or a
    * bimodal split that leaves the mean untouched).
    *
    * Reference-quantile buckets: edges are the ref snapshot's
    * `1/B .. (B-1)/B` quantiles (ALL columns in one aggregation pass —
    * exact interpolated percentile when `exact`, the mergeable
    * percentile_approx sketch otherwise), rounded to 6 dp so the edge
    * literals are engine-portable, then baked into both census scans as
    * plan-time literals. Each census is one scan + a (cols×B)-key
    * partial aggregation — nothing corpus-sized ever shuffles. Bucket =
    * number of edges strictly below the value (ties land LOW); NULLs
    * drop out of both census and totals.
    *
    * Fractions are add-`alpha` smoothed ((n + α) / (tot + αB)) so empty
    * buckets keep the PSI terms finite; one row per (col_name, bucket)
    * with both counts, both smoothed fractions and the PSI contribution
    * — `sum(psi_term) GROUP BY col_name` is the headline score (rule of
    * thumb: < 0.1 stable, > 0.25 action). */
  def psiReport(
      ref: DataFrame,
      cur: DataFrame,
      cols: Seq[String],
      buckets: Int = 10,
      exact: Boolean = false,
      accuracy: Int = 10000,
      alpha: Double = 0.5): DataFrame =
    psiAgainst(cur, psiFit(ref, cols, buckets, exact, accuracy, alpha))

  /** The fitted reference side of a PSI comparison: 6dp-rounded quantile
    * edges plus the reference bucket census (cols × buckets longs — a
    * driver-sized model whatever the corpus size). Fit once on the
    * reference snapshot, then [[psiAgainst]] scores any number of
    * current snapshots / micro-batches against it with one scan each. */
  final case class PsiModel(
      cols: Seq[String],
      buckets: Int,
      alpha: Double,
      edges: Seq[Array[Double]],
      refCounts: Seq[Array[Long]])

  /** Growable primitive buffer for [[ExactQuantiles]] — every non-null
    * value of the column lands here (the same worst-case footprint as
    * Spark's builtin `percentile`, whose OpenHashMap holds every DISTINCT
    * value with a count; on near-unique doubles the two are the same
    * size, but this one never boxes, never hashes and sorts primitives
    * once at eval). */
  private[graft] final class QuantBuf extends Serializable {
    var a: Array[Double] = new Array[Double](64)
    var n: Int = 0
    def add(x: Double): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = x; n += 1
    }
  }

  /** Exact interpolated percentiles as a typed aggregator — a drop-in
    * replacement for Spark's `percentile(col, array(fracs))` on DOUBLE
    * input, reproducing its result exactly (same selection and
    * interpolation arithmetic `(hi - pos)·v_lo + (pos - lo)·v_hi` over
    * the ascending-sorted multiset, null inputs skipped, null on an
    * empty/all-null column; pinned against the builtin in DriftSpec).
    * Why: the builtin is an ImperativeAggregate over an
    * OpenHashMap[boxed Double, Long] — per-row boxing + hash probes, a
    * map-entry merge per distinct value, and a boxed sort at eval. On
    * near-unique columns (prices, measurements) the map degenerates to
    * one entry per row and the hashing buys nothing. This buffer appends
    * to a primitive array (map-side partials merge by arraycopy) and
    * sorts once with `Arrays.sort(double[])`. Exactness still requires
    * the full multiset per group — the 100 TB path stays
    * `percentile_approx` (the `exact=false` default everywhere). */
  private[graft] final class ExactQuantiles(fracs: Array[Double])
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Double, QuantBuf, Seq[Double]] {
    def zero: QuantBuf = new QuantBuf
    def reduce(b: QuantBuf, x: java.lang.Double): QuantBuf = {
      if (x != null) b.add(x.doubleValue())
      b
    }
    def merge(a: QuantBuf, b: QuantBuf): QuantBuf = {
      if (a.n + b.n > a.a.length)
        a.a = java.util.Arrays.copyOf(a.a, math.max(a.n + b.n, a.a.length << 1))
      System.arraycopy(b.a, 0, a.a, a.n, b.n)
      a.n += b.n
      a
    }
    def finish(b: QuantBuf): Seq[Double] = {
      if (b.n == 0) return null
      java.util.Arrays.sort(b.a, 0, b.n)
      fracs.toSeq.map { p =>
        val pos = p * (b.n - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        if (hi == lo) b.a(lo)
        else (hi - pos) * b.a(lo) + (pos - lo) * b.a(hi)
      }
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[QuantBuf] =
      org.apache.spark.sql.Encoders.kryo[QuantBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** One `df.agg` column per requested column: exact mode is the typed
    * [[ExactQuantiles]] aggregator, approx the builtin sketch. */
  private def quantileAggs(
      cols: Seq[String], fracs: Seq[Double], exact: Boolean,
      accuracy: Int): Seq[Column] =
    if (exact) {
      val agg = udaf(new ExactQuantiles(fracs.toArray))
      cols.zipWithIndex.map { case (c, i) =>
        agg(col(c).cast("double")).as(s"__q$i") }
    } else {
      val arr = array(fracs.map(lit): _*)
      cols.zipWithIndex.map { case (c, i) =>
        percentile_approx(col(c).cast("double"), arr, lit(accuracy))
          .as(s"__q$i") }
    }

  private def bucketOf(c: String, e: Array[Double]): Column =
    when(col(c).isNotNull,
      e.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1).otherwise(0)
      })

  private def census(
      df: DataFrame, cols: Seq[String], edges: Seq[Array[Double]],
      side: String): DataFrame = {
    val pieces = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), bucketOf(c, edges(i)).as("bucket"))
    }
    df.select(explode(array(pieces: _*)).as("p")).select("p.*")
      .where(col("bucket").isNotNull)
      .groupBy("col_name", "bucket").agg(count(lit(1)).as(s"n_$side"))
  }

  /** Fit the PSI reference model: one aggregation for every column's
    * edges, one census scan collected to the driver (≤ cols×buckets
    * rows). */
  def psiFit(
      ref: DataFrame,
      cols: Seq[String],
      buckets: Int = 10,
      exact: Boolean = false,
      accuracy: Int = 10000,
      alpha: Double = 0.5): PsiModel = {
    require(cols.nonEmpty, "need at least one column")
    require(buckets >= 2 && buckets <= 1000, "need 2 <= buckets <= 1000")
    require(alpha > 0, "alpha must be positive (unsmoothed PSI diverges)")
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val qAggs = quantileAggs(cols, fracs, exact, accuracy)
    val qRow = ref.agg(qAggs.head, qAggs.tail: _*).head()
    val edges: Seq[Array[Double]] = cols.indices.map { i =>
      val e = qRow.getSeq[Double](i)
      require(e != null, s"column ${cols(i)} has no non-null ref values")
      e.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toArray
    }
    val idx = cols.zipWithIndex.toMap
    val counts = cols.map(_ => Array.fill(buckets)(0L))
    census(ref, cols, edges, "ref").collect().foreach { r =>
      counts(idx(r.getString(0)))(r.getInt(1)) = r.getLong(2)
    }
    PsiModel(cols, buckets, alpha, edges, counts)
  }

  /** Score one current snapshot (or micro-batch) against a fitted
    * [[PsiModel]]: ONE census scan of `cur` joined onto the model's
    * literal (col, bucket, n_ref) spine — same output as [[psiReport]].
    */
  def psiAgainst(cur: DataFrame, model: PsiModel): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val spine = model.cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until model.buckets).map(b => (c, b, model.refCounts(i)(b)))
    }.toDF("col_name", "bucket", "n_ref")
    val d = spine
      .join(census(cur, model.cols, model.edges, "cur"),
        Seq("col_name", "bucket"), "left")
      .na.fill(0L, Seq("n_cur"))
    // totals via a window over the (cols×B)-row detail — a groupBy+join
    // would re-execute the census scan through d's lineage
    val w = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    val alpha = model.alpha
    val den = lit(alpha) * model.buckets
    d.withColumn("__tr", sum("n_ref").over(w))
      .withColumn("__tc", sum("n_cur").over(w))
      .withColumn("__p", (col("n_ref") + alpha) / (col("__tr") + den))
      .withColumn("__q", (col("n_cur") + alpha) / (col("__tc") + den))
      .select(col("col_name"), col("bucket"), col("n_ref"), col("n_cur"),
        round(col("__p"), 6).as("ref_frac"),
        round(col("__q"), 6).as("cur_frac"),
        round((col("__q") - col("__p")) * log(col("__q") / col("__p")), 6)
          .as("psi_term"))
  }

  /** Quantile clipping (winsorization) of numeric columns — the
    * feature-hygiene step before fitting/scoring anything on corpus
    * statistics: each column clamps into its own [`lo`, `hi`] quantile
    * range, so a handful of corrupt outliers can no longer move a mean,
    * a z-score or a regression fit. ONE aggregation computes both bounds
    * for every column (exact interpolated percentile when `exact`, the
    * mergeable sketch otherwise), bounds are 6dp-rounded into plan
    * literals (the engine-portability convention), and the clamp is
    * scan-speed `greatest(least(...))`. NULLs pass through; each
    * column's original type is preserved. Bounds are snapped INWARD to
    * the column type's own precision first — integral columns clamp to
    * [ceil(lo_q), floor(hi_q)], decimals to the scale-s ceiling/floor —
    * so the cast back to the original type can never truncate a clamped
    * value OUTSIDE the documented quantile range (a double clamp bound
    * of 2.5 on an int column would otherwise cast 1 → 2, below the
    * bound). Corner: when no representable value lies inside the range
    * (ceil(lo) > floor(hi)) the raw bounds are used unsnapped. */
  def clipOutliers(
      df: DataFrame,
      cols: Seq[String],
      lo: Double = 0.01,
      hi: Double = 0.99,
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val qAggs = quantileAggs(cols, Seq(lo, hi), exact, accuracy)
    val qRow = df.agg(qAggs.head, qAggs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val q = qRow.getSeq[Double](i)
      if (q == null) d // no non-null values: nothing to clamp
      else {
        def r6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val t = d.schema(c).dataType
        // snap bounds inward to the column type's representable grid so
        // the final cast cannot push a clamped value outside [lo, hi]
        def snap(x: Double, isUpper: Boolean): Double = t match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType =>
            if (isUpper) math.floor(x) else math.ceil(x)
          case dt: org.apache.spark.sql.types.DecimalType =>
            BigDecimal(x).setScale(dt.scale,
              if (isUpper) BigDecimal.RoundingMode.FLOOR
              else BigDecimal.RoundingMode.CEILING).toDouble
          case _ => x
        }
        val (rawLo, rawHi) = (r6(q(0)), r6(q(1)))
        val (loB, hiB) = {
          val (l, h) = (snap(rawLo, isUpper = false), snap(rawHi, isUpper = true))
          if (l <= h) (l, h) else (rawLo, rawHi) // no representable value in range
        }
        // greatest/least SKIP nulls (a null row would clamp to the bound)
        // — gate explicitly so nulls pass through
        d.withColumn(c,
          when(col(c).isNotNull,
            greatest(least(col(c).cast("double"), lit(hiB)),
              lit(loB))).cast(t))
      }
    }
  }

  /** Roll [[psiReport]] detail up to one PSI score per column. */
  def psiSummary(detail: DataFrame): DataFrame =
    detail.groupBy("col_name")
      .agg(round(sum("psi_term"), 6).as("psi"),
        sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"))

  /** Pairwise Pearson correlation of numeric columns in ONE aggregation
    * pass (d·(d-1)/2 `corr` aggregates, map-side partials — the moment
    * trick [[Fit]] uses, via Spark's built-in corr). One row per ordered
    * pair (i < j). NULL when a column is constant. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 64, "need 2..64 columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    // alias by PAIR INDEX, not by name: name-based aliases collide when
    // column names contain underscores ((a, b_c) and (a_b, c) would both
    // alias to __c_a_b_c → ambiguous-column AnalysisException)
    val aggs = pairs.map { case (i, j) =>
      round(corr(col(cols(i)).cast("double"), col(cols(j)).cast("double")), 6)
        .as(s"__c_${i}_$j")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pieces = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col(s"__c_${i}_$j").as("pearson"))
    }
    row.select(explode(array(pieces: _*)).as("p")).select("p.*")
  }

  /** Snapshot drift audit between two corpus versions — the check a daily
    * ingest runs before promoting a build: one row per column with both
    * [[profile]]s side by side plus shift columns (null fraction, mean).
    * Shifts stay UNROUNDED raw doubles: the means are already 6-dp values,
    * and identical IEEE subtraction/division is what keeps an ANSI replay
    * bit-equal (a second rounding would reintroduce half-mode skew).
    * Cost: the two profile scans; the join is #columns rows. A column
    * present in only one snapshot survives the full-outer join with nulls
    * on the missing side — schema drift is visible, not an error. */
  def drift(
      prev: DataFrame,
      next: DataFrame,
      cols: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, cols, exactDistinct).select(
        col("col_name"),
        col("n_rows").as(s"${tag}_rows"),
        col("n_nulls").as(s"${tag}_nulls"),
        col("n_distinct").as(s"${tag}_distinct"),
        col("min").as(s"${tag}_min"),
        col("max").as(s"${tag}_max"),
        col("mean").as(s"${tag}_mean"))
    side(prev, "prev").join(side(next, "next"), Seq("col_name"), "full_outer")
      .withColumn("null_frac_shift",
        col("next_nulls").cast("double") / col("next_rows") -
          col("prev_nulls").cast("double") / col("prev_rows"))
      .withColumn("mean_shift", col("next_mean") - col("prev_mean"))
  }
}
