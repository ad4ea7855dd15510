package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** SRT/WebVTT parsing semantics ([[SubtitleOps]]). */
class SubtitleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixture = SubtitleOps.subtitleFixture(spark).collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("SRT: CRLF blocks, comma millis, multi-line text, tags strip") {
    val cs = SubtitleOps.parseSubtitles(fixture(100L)).get
    assert(cs == Vector(
      SubtitleOps.Cue(1, 1000L, 4500L, "Hello there."),
      SubtitleOps.Cue(2, 5250L, 7000L, "Two lines\nof text")))
  }

  test("WebVTT: header + NOTE skipped, cue ids, settings, optional " +
      "hours, class tags strip") {
    val cs = SubtitleOps.parseSubtitles(fixture(101L)).get
    assert(cs == Vector(
      SubtitleOps.Cue(1, 65000L, 67500L, "Styled cue"),
      SubtitleOps.Cue(2, 3600000L, 3602000L, "With hours")))
  }

  test("edge contracts: no cues → None, loud cap, walk-order numbering " +
      "over lying SRT indices, short fractional digits") {
    assert(SubtitleOps.parseSubtitles(fixture(102L)).isEmpty)
    assert(SubtitleOps.parseSubtitles(null).isEmpty)
    assert(SubtitleOps.parseSubtitles(fixture(100L), maxCues = 1).isEmpty)
    // declared indices lie (7, 3): walk order wins
    val lying = "7\n00:00:01,5 --> 00:00:02,00\nA\n\n3\n00:00:03,000 --> 00:00:04,000\nB\n"
    val cs = SubtitleOps.parseSubtitles(lying).get
    assert(cs.map(_.cue) == Vector(1, 2))
    // ",5" right-pads to 500 ms; ",00" to 0
    assert(cs(0).start_ms == 1500L && cs(0).end_ms == 2000L)
  }

  test("cuePlan flags unparseable rows; subtitle_text joins cue text") {
    import org.apache.spark.sql.functions._
    val plan = SubtitleOps.cuePlan(SubtitleOps.subtitleFixture(spark))
      .orderBy("media_id", "cue").collect()
    assert(plan.length == 5)
    assert(plan.count(!_.getBoolean(1)) == 1)
    val txt = SubtitleOps.subtitleFixture(spark)
      .select(col("media_id"),
        SubtitleOps.subtitleTextCol(col("content")).as("t"))
      .orderBy("media_id").collect()
    assert(txt(0).getString(1) == "Hello there.\nTwo lines\nof text")
    assert(txt(2).isNullAt(1))
  }
}
