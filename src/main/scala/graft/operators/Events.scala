package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level event-log analytics. The dialect's SessionWindow aggregates
  * per session; these operators tag the individual rows instead — the
  * shape funnel/attribution pipelines want.
  */
object Events {

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
}
