package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's relational layer lacks as primitives.
  *
  * The naive as-of formulation — a theta join `l.key = r.key AND
  * l.ts >= r.ts` plus a per-pair rank — explodes into every (left, right)
  * combination per key before pruning, which is quadratic in per-key row
  * counts and unusable at event-log scale. The implementation here is the
  * scale-correct one: tag both sides, union, and carry the latest right
  * row forward with a running `last(ignoreNulls)` over one partitioned
  * window — ONE shuffle on the key, Spark's spillable window sort, zero
  * joins.
  */
object Joins {

  /** As-of join: for every left row, attach `valueCols` from the LATEST
    * right row of the same key with `right.tsCol <= left.tsCol` (nulls
    * when no right row precedes) — the event-log enrichment primitive
    * ("state as of this event": last price before the trade, last config
    * before the request). `direction = "forward"` flips the match to the
    * EARLIEST right row with `right.tsCol >= left.tsCol` (the
    * next-event/lookahead enrichment: next maintenance after the error,
    * next price after the quote).
    *
    * At equal timestamps the right row is visible to the left row (the
    * right side orders first inside the window), matching SQL
    * `ASOF JOIN ... ON l.ts >= r.ts` (resp. `l.ts <= r.ts`) semantics
    * (the DuckDB oracle).
    *
    * @param on        equi-join key columns (present on both sides)
    * @param valueCols right columns carried onto the left rows; must not
    *                  collide with left column names — alias the right
    *                  side first if they do
    * @param tieBreak  right column breaking ties among right rows sharing
    *                  the same (key, timestamp): the HIGHEST tieBreak
    *                  value wins (it is the running-last row in the merge
    *                  walk). Default none — then right (key, ts) pairs
    *                  must be unique for the result to be deterministic
    *                  (the repo-wide determinism contract; sessionize
    *                  imposes the same requirement)
    * @return the left rows (all columns, original values) + `valueCols` */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String = "ts",
      rightTs: String = "ts",
      valueCols: Seq[String] = Seq("value"),
      toleranceSec: Double = 0.0,
      direction: String = "backward",
      tieBreak: Option[String] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi key")
    require(valueCols.nonEmpty, "no right columns to carry")
    require(toleranceSec >= 0, "tolerance must be >= 0 (0 = unbounded)")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    tieBreak.foreach(c => require(valueCols.contains(c),
      s"tieBreak column '$c' must be one of valueCols so it can ride the merge"))
    val backward = direction == "backward"
    val collide = valueCols.filter(left.columns.contains)
    require(collide.isEmpty,
      s"right value columns collide with left columns: ${collide.mkString(", ")}")
    // the match timestamp rides inside the carried struct so a staleness
    // tolerance can null out matches older than the horizon (the
    // merge-asof tolerance semantics: the match is still "the latest
    // preceding row" — it is just too old to use)
    val vstruct = struct(valueCols.map(col) :+ col(rightTs).as("__rts"): _*)
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r2base = right
      .select(on.map(col) :+ col(rightTs).as("__ts") :+ vstruct.as("__v"): _*)
      .withColumn("__side", lit(0))
    // the tiebreak rides as its own union column (left rows read NULL
    // there, which never matters: at equal __ts every right row orders
    // before every left row via __side, so __tb only ranks right rows
    // against each other)
    val r2 = tieBreak match {
      case Some(c) => r2base.withColumn("__tb", col(s"__v.$c"))
      case None    => r2base
    }
    // right rows sort before left rows at equal __ts → equal-ts matches
    // forward = the same running-last walk over REVERSED time: at equal
    // __ts the right row still orders first, so the equal-ts match stays
    // visible in both directions. Among right rows at the SAME (key, ts)
    // the highest tieBreak orders last → it is the carried running-last
    // in both directions.
    val tieBreakOrd = tieBreak.map(_ => col("__tb").asc_nulls_first).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(on.map(col): _*)
      .orderBy((if (backward) col("__ts").asc else col("__ts").desc) +:
        col("__side").asc +: tieBreakOrd: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // timestamps cast to epoch seconds; plain numeric ts columns compare
    // in their own units
    val gap =
      if (backward)
        col("__ts").cast("double") - col("__m.__rts").cast("double")
      else col("__m.__rts").cast("double") - col("__ts").cast("double")
    val fresh =
      if (toleranceSec == 0.0) lit(true) else gap <= toleranceSec
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => when(fresh, col(s"__m.$c")).as(c)): _*)
  }

  /** Range (interval) join: left rows matched to right intervals
    * `[startCol, endCol]` sharing the equi keys — point-in-interval
    * enrichment (event within a campaign window, reading within a
    * maintenance window). Spark's own plan for the theta predicate is a
    * nested-loop per key; here both sides bucketize the time axis
    * (`bucketWidth`, same units as the point/bound columns, which must be
    * numeric — convert timestamps with `unix_micros` first): the right
    * side explodes one row per covered bucket, the join is a plain
    * equi-join on (keys, bucket), and the exact predicate filters inside.
    * Each left row lives in exactly one bucket, so no pair dedup is
    * needed.
    *
    * Fanout = interval span / bucketWidth per right row; pick bucketWidth
    * near the TYPICAL interval length so most intervals explode to 1-2
    * buckets while the per-bucket population stays bounded.
    *
    * @return inner-join rows: all left + all right columns (caller
    *   disambiguates shared names beyond `on` by aliasing first) */
  def range(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l2 = left.withColumn("__b", floor(col(pointCol) / bucketWidth))
    val r2 = right.withColumn("__b",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    l2.join(r2, on :+ "__b")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }

  /** Skew-salted equi-join — the explicit lever when one join key
    * dominates beyond what AQE's partition splitting fixes (corpus-scale
    * reality: a boilerplate fingerprint, an empty-string host, a default
    * tenant id carrying 10% of all rows lands on ONE reducer in a plain
    * shuffle join). The left (large, skewed) side gets a salt in
    * `[0, salts)`; the right side is exploded `salts`-fold; the join key
    * becomes (key, salt), so each hot key spreads over `salts` reducers.
    * The salt derives from `monotonically_increasing_id` — it varies with
    * partitioning, which is safe because the salt only places rows, it
    * never changes the join result (differentially pinned vs the plain
    * join). Right-side fanout × `salts` is the price: use for a small-ish
    * right side (lookup/metadata tables too big or too hot to broadcast).
    * Inner and left joins only — the shapes where every left row must
    * appear exactly as in the unsalted join. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 2 && salts <= 4096, "salts must be in [2, 4096]")
    require(Set("inner", "left", "left_outer").contains(joinType),
      "saltedJoin supports inner and left joins")
    val l2 = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r2 = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l2.join(r2, on :+ "__salt", joinType).drop("__salt")
  }

  /** Interval×interval OVERLAP join — pairs where `[lStart, lEnd]` and
    * `[rStart, rEnd]` intersect (closed intervals: `lStart <= rEnd AND
    * rStart <= lEnd`), the span-vs-span shape [[range]]'s point-in-interval
    * cannot express (outage windows vs sessions, annotation spans vs
    * document chunks).
    *
    * Shape at scale: both sides explode into coarse time buckets of
    * `bucketWidth` and the join is a plain equi-join on (`on`…, bucket) —
    * never a nested loop. An overlapping pair shares every bucket in the
    * intersection, so each pair is emitted exactly once by the
    * canonical-bucket election: only the FIRST shared bucket,
    * `greatest(floor(lStart/w), floor(rStart/w))`, keeps the row — no
    * distinct, no post-dedup shuffle. Per-row fanout is intervalLength/w:
    * pick `bucketWidth` near the median interval length (width too small
    * explodes rows, too large degrades toward a per-key cross join —
    * exactly [[range]]'s tuning story). Column names must be disjoint
    * across the two sides apart from the `on` keys. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l2 = left.withColumn("__b",
      explode(sequence(floor(col(lStart) / bucketWidth),
        floor(col(lEnd) / bucketWidth))))
    val r2 = right.withColumn("__b",
      explode(sequence(floor(col(rStart) / bucketWidth),
        floor(col(rEnd) / bucketWidth))))
    l2.join(r2, on :+ "__b")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") === greatest(
        floor(col(lStart) / bucketWidth), floor(col(rStart) / bucketWidth)))
      .drop("__b")
  }
}
