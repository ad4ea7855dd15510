package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** topPaths: session splitting, step capping, census counting. */
class EventPathsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("topPaths counts hand-built session paths, caps steps, dedups keys") {
    // user A: one session view>click>buy, then (after the gap) view>click
    // user B: one session view>click; one long session of 6 'scroll's
    val ev = Seq(
      (1L, "A", 100L, "view"), (2L, "A", 110L, "click"), (3L, "A", 120L, "buy"),
      (4L, "A", 10000L, "view"), (5L, "A", 10010L, "click"),
      (6L, "B", 100L, "view"), (7L, "B", 150L, "click"),
      (8L, "B", 20000L, "scroll"), (9L, "B", 20010L, "scroll"),
      (10L, "B", 20020L, "scroll"), (11L, "B", 20030L, "scroll"),
      (12L, "B", 20040L, "scroll"), (13L, "B", 20050L, "scroll"))
      .toDF("event_id", "user_id", "t", "event_type")
    val got = Events.topPaths(ev, Seq("user_id"), "t", "event_type",
        gap = 1000L, tiebreak = "event_id", maxSteps = 4, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("view>click", 2L, 2L),          // A session 2 + B session 1
      ("scroll>scroll>scroll>scroll", 1L, 1L), // capped at 4 steps
      ("view>click>buy", 1L, 1L)))
    // equal-count paths order lexicographically (deterministic boundary)
    val counts = got.map(_._2)
    assert(counts.sameElements(counts.sortBy(-_.toLong)))
  }

  test("topPaths composite keys count as structs and the separator is configurable") {
    // composite keys that a string concat would collide ("x y"+"z" vs
    // "x"+"y z") must count as TWO distinct keys
    val ev = Seq(
      (1L, "x y", "z", 100L, "view"),
      (2L, "x", "y z", 100L, "view"))
      .toDF("event_id", "org", "user", "t", "event_type")
    val got = Events.topPaths(ev, Seq("org", "user"), "t", "event_type",
      gap = 10L, tiebreak = "event_id", maxSteps = 3, k = 5)
      .head()
    assert(got.getString(0) == "view" && got.getLong(1) == 2 &&
      got.getLong(2) == 2, got.toString)
    // custom separator for type alphabets that may contain '>'
    val ev2 = Seq((1L, "U", 100L, "a>b"), (2L, "U", 110L, "c"))
      .toDF("event_id", "user_id", "t", "event_type")
    val p = Events.topPaths(ev2, Seq("user_id"), "t", "event_type",
      gap = 100L, tiebreak = "event_id", maxSteps = 3, k = 3,
      sep = " ").head().getString(0)
    assert(p == "a>b c")
  }

  test("topPaths ties at equal timestamps follow the tiebreak column") {
    val ev = Seq(
      (2L, "U", 100L, "second"), (1L, "U", 100L, "first"))
      .toDF("event_id", "user_id", "t", "event_type")
    val got = Events.topPaths(ev, Seq("user_id"), "t", "event_type",
      gap = 10L, tiebreak = "event_id", maxSteps = 5, k = 5)
      .head().getString(0)
    assert(got == "first>second")
  }
}
