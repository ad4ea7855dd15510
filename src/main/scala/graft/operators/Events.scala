package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Row-level event-log analytics. The dialect's SessionWindow aggregates
  * per session; these operators tag the individual rows instead — the
  * shape funnel/attribution pipelines want.
  */
object Events {

  /** Windowed rate-anomaly detection: bucket events into `bucketSec`
    * tumbling windows per key, then score each bucket's count against the
    * `trailing` preceding buckets of the SAME key (z-score over their
    * mean/sample-stddev, with the stddev floored at 1.0 so a perfectly
    * steady history — the classic pre-burst shape, sd = 0 — still scores
    * the burst instead of dividing by zero). `z` is NULL until at least
    * 2 trailing buckets exist — a NULL never flags, so cold keys don't
    * alarm. One partial-agg shuffle to the (key, bucket)
    * counts, then one windowed pass over the (tiny) bucket series per
    * key: the raw event log is never window-sorted. Empty buckets are
    * NOT materialized: the trailing window is over observed buckets, the
    * idle-gap-then-burst case flags via the count jump itself. */
  def rateAnomalies(
      events: DataFrame,
      on: Seq[String],
      tsCol: String = "ts",
      bucketSec: Long = 3600L,
      trailing: Int = 8,
      threshold: Double = 3.0): DataFrame = {
    require(on.nonEmpty, "rateAnomalies needs at least one key column")
    require(bucketSec > 0 && trailing >= 2, "bucketSec > 0, trailing >= 2")
    val bucket = floor(unix_timestamp(col(tsCol)) / bucketSec).cast("long") * bucketSec
    val counts = events
      .groupBy(on.map(col) :+ bucket.as("bucket_start"): _*)
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(on.map(col): _*)
      .orderBy(col("bucket_start"))
      .rowsBetween(-trailing, -1)
    val mu = avg(col("n_events")).over(w)
    val sd = stddev_samp(col("n_events")).over(w)
    val cnt = count(col("n_events")).over(w)
    val z = when(cnt >= 2,
      round((col("n_events") - mu) / greatest(sd, lit(1.0)), 6))
    counts
      .withColumn("z", z)
      .withColumn("anomaly", coalesce(col("z") >= threshold, lit(false)))
  }

  /** Per-key state for [[rateAnomaliesStream]]: open bucket counts, the
    * ring of the last `trailing` CLOSED buckets, the key's max event
    * time, and the highest closed bucket (late events below it drop). */
  final case class RateState(
      pending: Map[Long, Long],
      ring: Vector[(Long, Long)],
      maxTs: Long,
      closedHorizon: Long)

  /** One scored bucket. `z` is None until 2 closed history buckets
    * exist; a None never flags. */
  final case class RateAnomaly(
      key: String, bucket_start: Long, n_events: Long,
      z: Option[Double], anomaly: Boolean)

  /** Streaming twin of [[rateAnomalies]]: cross-micro-batch bucket
    * accumulation with O(trailing + open-buckets) state per key. A bucket
    * closes when the key's observed watermark (max event time − `oooMs`)
    * passes its end — the same per-key closing rule the stateful window
    * operators use — then scores against the ring of previously closed
    * buckets exactly like the batch version (sd floored at 1, round 6).
    * Events arriving for a bucket at or below the closed horizon drop
    * (the late-data contract). Append-mode output. */
  def rateAnomaliesStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String = "ts",
      bucketSec: Long = 3600L,
      trailing: Int = 8,
      threshold: Double = 3.0,
      oooMs: Long = 0L): org.apache.spark.sql.Dataset[RateAnomaly] = {
    require(bucketSec > 0 && trailing >= 2, "bucketSec > 0, trailing >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val typed = events
      .select(col(keyCol).cast("string").as("_1"),
        floor(unix_micros(col(tsCol)) / 1000L).cast("long").as("_2"))
      .as[(String, Long)]
    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: String, it: Iterator[(String, Long)], state: GroupState[RateState]) =>
        val st = state.getOption.getOrElse(
          RateState(Map.empty, Vector.empty, Long.MinValue, Long.MinValue))
        var pending = st.pending
        var maxTs = st.maxTs
        it.foreach { case (_, tsMs) =>
          maxTs = math.max(maxTs, tsMs)
          val b = math.floorDiv(math.floorDiv(tsMs, 1000L), bucketSec) * bucketSec
          if (b > st.closedHorizon) pending += b -> (pending.getOrElse(b, 0L) + 1L)
        }
        val wmSec = math.floorDiv(maxTs - oooMs, 1000L)
        var ring = st.ring
        var horizon = st.closedHorizon
        val out = Vector.newBuilder[RateAnomaly]
        pending.keys.toSeq.sorted.foreach { b =>
          if (b + bucketSec <= wmSec) {
            val n = pending(b)
            val hist = ring.takeRight(trailing).map(_._2)
            val z = if (hist.size >= 2) {
              val mu = hist.sum.toDouble / hist.size
              val sd = math.sqrt(
                hist.map(x => (x - mu) * (x - mu)).sum / (hist.size - 1))
              Some(BigDecimal((n - mu) / math.max(sd, 1.0))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            } else None
            out += RateAnomaly(key, b, n, z, z.exists(_ >= threshold))
            ring = (ring :+ (b, n)).takeRight(trailing)
            horizon = math.max(horizon, b)
            pending -= b
          }
        }
        state.update(RateState(pending, ring, maxTs, horizon))
        out.result().iterator
    }
  }

  /** Gap-based sessionization: every event gains `session_seq` — the
    * 1-based index of its session within its key — where a new session
    * starts when the gap to the previous event exceeds `gap` (same units
    * as the numeric `tsCol`; convert timestamps with `unix_micros`
    * first).
    *
    * lag + running sum over ONE partitioned window: one shuffle on the
    * keys, Spark's spillable window sort, no state operator — the batch
    * sessionization shape that scales to full event-log history.
    *
    * @param tiebreak orders equal-timestamp events deterministically
    *   (pass the event id); required for engine-portable replays */
  def sessionize(
      events: DataFrame,
      on: Seq[String],
      tsCol: String,
      gap: Long,
      tiebreak: String): DataFrame = {
    require(on.nonEmpty, "sessionize needs at least one key column")
    require(gap > 0, "gap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc, col(tiebreak).asc)
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__ns",
        when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("__ns")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("long"))
      .drop("__ns")
  }

  /** Most-common event paths: sessionize, take each session's first
    * `maxSteps` event types in time order, and count identical paths
    * corpus-wide — the "what do users actually do" sequence-mining read
    * (and, over pipeline telemetry, the dominant-control-flow audit).
    *
    * Scale shape: [[sessionize]]'s one key shuffle, then one
    * (keys, session) aggregation whose collected value is capped at
    * `maxSteps` SHORT STRINGS per session (the ranked window runs over a
    * slim (keys, session, ts, type) projection — payload columns never
    * ride the sort), then a bounded path census (distinct paths ≤
    * |types|^maxSteps in the worst case, in practice a heavy-hitter-
    * shaped skew the partial agg collapses map-side). Ties at equal
    * timestamps order by `tiebreak` — the same determinism contract as
    * sessionize, which makes the DuckDB replay exact.
    *
    * @param sep joins the step types into the path string — pick one that
    *   cannot occur inside a type value, or distinct step sequences can
    *   render identically and merge in the census
    * @return (path, n_sessions, n_keys) — top `k` by count desc, path asc */
  def topPaths(
      events: DataFrame,
      on: Seq[String],
      tsCol: String,
      typeCol: String,
      gap: Long,
      tiebreak: String,
      maxSteps: Int = 5,
      k: Int = 20,
      sep: String = ">"): DataFrame = {
    require(maxSteps >= 1 && k >= 1, "need maxSteps >= 1 and k >= 1")
    require(sep.nonEmpty, "separator must be non-empty")
    val slim = sessionize(
      events.select((on :+ tsCol :+ typeCol :+ tiebreak).distinct.map(col): _*),
      on, tsCol, gap, tiebreak)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((on :+ "session_seq").map(col): _*)
      .orderBy(col(tsCol).asc, col(tiebreak).asc)
    slim
      .withColumn("__step", row_number().over(w))
      .filter(col("__step") <= maxSteps)
      .groupBy((on :+ "session_seq").map(col): _*)
      .agg(array_join(
        transform(array_sort(collect_list(
          struct(col("__step").as("s"), col(typeCol).as("t")))),
          e => e("t")), sep).as("path"))
      // distinct keys counted as a STRUCT: a concatenated string would
      // collide composite keys on the separator and skip NULL parts
      .withColumn("__key", struct(on.map(col): _*))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col("__key")).as("n_keys"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Ordered conversion funnel: one output row per key with the earliest
    * completion time of each step, where step i counts only strictly after
    * step i-1 completed (one event can never complete two steps). Greedy
    * earliest-first is optimal for an unconstrained chain — taking the
    * earliest step-1 time can only admit more step-2 candidates — so the
    * result equals the min-after fixpoint `t_i = min{ts : type = step_i,
    * ts > t_(i-1)}`, which an external SQL oracle can replay as chained
    * min-aggregations.
    *
    * Scale shape: filter to funnel-type events, ONE shuffle on the key,
    * Spark's spillable partition sort, then a per-partition streaming fold
    * with O(#steps) state per key — no per-key buffering, no join per
    * step, hot keys bounded by the external sort. Keys whose only events
    * are later steps still emit (steps_completed = 0).
    *
    * @param tsCol numeric event time (convert timestamps with
    *   `unix_micros` first, as in [[sessionize]])
    * @return one row per key: key, step_1..step_N (numeric time of each
    *   completion, null once the chain breaks), steps_completed */
  def funnel(
      events: DataFrame,
      on: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val n = steps.length
    val slim = events
      .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .select(col(on), col(typeCol).cast("string").as("__t"),
        col(tsCol).cast("long").as("__ts"))
      .repartition(col(on))
      .sortWithinPartitions(col(on), col("__ts"))
    val outSchema = StructType(
      slim.schema.fields(0) +:
        steps.indices.map(i => StructField(s"step_${i + 1}", LongType)) :+
        StructField("steps_completed", IntegerType, nullable = false))
    val stepsArr = steps.toArray
    slim.mapPartitions { rows =>
      val buf = rows.buffered
      new scala.collection.AbstractIterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val key = buf.head.get(0)
          val times = new Array[Any](n) // nulls where the chain broke
          var c = 0
          var last = Long.MinValue
          while (buf.hasNext && java.util.Objects.equals(buf.head.get(0), key)) {
            val r = buf.next()
            if (c < n && r.getString(1) == stepsArr(c)) {
              val ts = r.getLong(2)
              if (c == 0 || ts > last) { times(c) = ts; last = ts; c += 1 }
            }
          }
          Row.fromSeq(key +: times.toIndexedSeq :+ c)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Cohort retention: bucket event times into periods (`period` in the
    * same units as the numeric `tsCol` — e.g. 86,400,000,000 for daily
    * cohorts over `unix_micros`), cohort each key by its first active
    * period, and count distinct active keys per (cohort, offset).
    *
    * The cohort label comes from an unordered `min` window over the key —
    * one shuffle, no self-join of the event log against a first-activity
    * table; the final (cohort, offset) aggregation uses Spark's two-phase
    * distinct expansion (map-side partials, no per-group buffering).
    *
    * @return (cohort, offset, active): period index of the cohort, periods
    *   since the cohort period, distinct keys active at that offset */
  def retention(
      events: DataFrame,
      on: String,
      tsCol: String,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(on))
    events
      .filter(col(tsCol).isNotNull)
      .select(col(on), floor(col(tsCol) / period).cast("long").as("__p"))
      .withColumn("__cohort", min(col("__p")).over(w))
      .groupBy(col("__cohort").as("cohort"),
        (col("__p") - col("__cohort")).as("offset"))
      .agg(countDistinct(col(on)).as("active"))
  }
}
