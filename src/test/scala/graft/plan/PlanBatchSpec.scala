package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.{GraftEngine, SparkTestBase}

/** Batch-path semantics, mirroring the reference e2e suites
  * (reference: test/e2e/ — window_tumbling_test.go, join_test.go,
  * analytic_test.go, function_test.go, null_test.go, ...). */
class PlanBatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // F1-style IoT fixture (FIXTURES.md F1): ms-epoch ts
  lazy val events = Seq(
    ("d1", 20.0, 1000L, "active"),
    ("d1", 30.0, 2000L, "active"),
    ("d1", 40.0, 6000L, "off"),
    ("d2", 10.0, 1500L, "active"),
    ("d2", 50.0, 7000L, "active")
  ).toDF("deviceId", "temperature", "ts", "status")

  def run(sql: String) = GraftEngine.sql(sql, Map("stream" -> events))

  test("filter + projection") {
    val out = run("SELECT deviceId, temperature FROM stream WHERE temperature > 25")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("d1", 30.0), ("d1", 40.0), ("d2", 50.0)))
  }

  test("transform expression") {
    val out = run("SELECT deviceId, temperature * 1.8 + 32 AS fahrenheit FROM stream WHERE deviceId = 'd2'")
      .collect().map(_.getDouble(1)).toSet
    assert(out == Set(50.0, 122.0))
  }

  test("tumbling window aggregation with window bounds") {
    val out = run(
      "SELECT deviceId, avg(temperature) AS a, count(*) AS c, " +
        "window_start() AS ws, window_end() AS we FROM stream " +
        "GROUP BY deviceId, TumblingWindow('5s') WITH (TIMESTAMP='ts', TIMEUNIT='ms') " +
        "ORDER BY deviceId, ws")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("d1", 25.0, 2L, 0L, 5000L),
      ("d1", 40.0, 1L, 5000L, 10000L),
      ("d2", 10.0, 1L, 0L, 5000L),
      ("d2", 50.0, 1L, 5000L, 10000L)))
  }

  test("post-aggregation expressions and HAVING on alias") {
    val out = run(
      "SELECT deviceId, max(temperature) - min(temperature) AS rng, " +
        "round(avg(temperature), 1) AS ra FROM stream " +
        "GROUP BY deviceId HAVING rng > 25 ORDER BY deviceId")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("d2", 40.0)))
  }

  test("HAVING with unselected aggregate") {
    val out = run(
      "SELECT deviceId, count(*) AS c FROM stream GROUP BY deviceId " +
        "HAVING max(temperature) > 45")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("d2"))
  }

  test("counting window per group key") {
    val out = run(
      "SELECT deviceId, sum(temperature) AS s FROM stream " +
        "GROUP BY deviceId, CountingWindow(2) WITH (TIMESTAMP='ts') " +
        "ORDER BY deviceId, s")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // only complete 2-row windows fire (reference: window/counting.go — the
    // trailing partial is held back): d1: [20,30] → 50, [40] held; d2: [10,50] → 60
    assert(out.toSeq == Seq(("d1", 50.0), ("d2", 60.0)))
  }

  test("lag analytic with partition") {
    val out = run(
      "SELECT deviceId, ts, lag(temperature) OVER (PARTITION BY deviceId) AS prev " +
        "FROM stream ORDER BY deviceId, ts")
      .collect().map(r => (r.getString(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(("d1", null), ("d1", 20.0), ("d1", 30.0), ("d2", null), ("d2", 10.0)))
  }

  test("lag with default and expression wrapping") {
    val out = run(
      "SELECT deviceId, ts - lag(ts, 1, 0) OVER (PARTITION BY deviceId) AS d " +
        "FROM stream ORDER BY deviceId, ts")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("d1", 1000L), ("d1", 1000L), ("d1", 4000L), ("d2", 1500L), ("d2", 5500L)))
  }

  test("acc_sum running aggregate") {
    val out = run(
      "SELECT deviceId, acc_sum(temperature) OVER (PARTITION BY deviceId) AS t " +
        "FROM stream ORDER BY deviceId, t")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("d1", 20.0), ("d1", 50.0), ("d1", 90.0), ("d2", 10.0), ("d2", 60.0)))
  }

  test("changed_col global state with row suppression") {
    // no OVER → one global state over arrival order (reference: stream/analytic.go)
    // ts order: 1000 active | 1500 active(dup→suppressed) | 2000 active(sup) |
    //           6000 off | 7000 active
    val out = run(
      "SELECT deviceId, ts, changed_col(true, status) AS st FROM stream " +
        "ORDER BY ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("d1", 1000L, "active"), ("d1", 6000L, "off"),
      ("d2", 7000L, "active")))
  }

  test("changed_col partitioned per device") {
    val out = run(
      "SELECT deviceId, ts, changed_col(true, status) OVER (PARTITION BY deviceId) AS st " +
        "FROM stream ORDER BY deviceId, ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("d1", 1000L, "active"), ("d1", 6000L, "off"),
      ("d2", 1500L, "active")))
  }

  test("had_changed multi-column") {
    val out = run(
      "SELECT deviceId, ts, had_changed(true, status, temperature) " +
        "OVER (PARTITION BY deviceId) AS h FROM stream ORDER BY deviceId, ts")
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1000L, true), (2000L, true), (6000L, true),
      (1500L, true), (7000L, true)))
  }

  test("latest with WHEN gating") {
    val out = run(
      "SELECT deviceId, ts, latest(temperature) OVER (PARTITION BY deviceId WHEN temperature > 15) AS l " +
        "FROM stream ORDER BY deviceId, ts")
      .collect().map(r => (r.getString(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(("d1", 20.0), ("d1", 30.0), ("d1", 40.0),
      ("d2", null), ("d2", 50.0)))
  }

  test("join enrichment inner and left") {
    val meta = Seq(("d1", "plantA"), ("d3", "plantC")).toDF("deviceId", "location")
    val t = Map("stream" -> events, "meta" -> meta)
    val inner = GraftEngine.sql(
      "SELECT deviceId, m.location FROM stream JOIN meta m ON deviceId = m.deviceId", t)
    assert(inner.collect().map(_.getString(1)).forall(_ == "plantA"))
    assert(inner.count() == 3)
    val left = GraftEngine.sql(
      "SELECT deviceId, m.location FROM stream LEFT JOIN meta m ON deviceId = m.deviceId " +
        "WHERE m.location IS NULL", t)
    assert(left.count() == 2) // d2 rows
  }

  test("join aliases with underscores cannot collide internal column names") {
    // aliases "a" (column b_c) and "a_b" (column c): alias-derived
    // prefixes would rename both payloads to __j_a_b_c — the internal
    // names are prefixed by join POSITION instead
    val t1 = Seq(("d1", "X")).toDF("deviceId", "b_c")
    val t2 = Seq(("d1", "Y")).toDF("deviceId", "c")
    val out = GraftEngine.sql(
      "SELECT deviceId, a.b_c, a_b.c FROM stream " +
        "JOIN meta a ON deviceId = a.deviceId " +
        "JOIN meta2 a_b ON deviceId = a_b.deviceId",
      Map("stream" -> events, "meta" -> t1, "meta2" -> t2))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(out.nonEmpty && out.forall(_ == ("X", "Y")))
  }

  test("join + aggregation") {
    val meta = Seq(("d1", "plantA"), ("d2", "plantB")).toDF("deviceId", "location")
    val out = GraftEngine.sql(
      "SELECT m.location AS loc, avg(temperature) AS a FROM stream " +
        "JOIN meta m ON deviceId = m.deviceId GROUP BY m.location ORDER BY loc",
      Map("stream" -> events, "meta" -> meta))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("plantA", 30.0), ("plantB", 30.0)))
  }

  test("unnest with sibling column") {
    val df = Seq((1, Seq("a", "b")), (2, Seq("c")), (3, Seq())).toDF("id", "tags")
    val out = GraftEngine.sql("SELECT id, unnest(tags) AS tag FROM stream", Map("stream" -> df))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSet == Set((1, "a"), (1, "b"), (2, "c")))
  }

  test("unnest of struct array expands columns") {
    val df = Seq((1, Seq((10, "x"), (20, "y")))).toDF("id", "objs")
    val out = GraftEngine.sql("SELECT unnest(objs) FROM stream", Map("stream" -> df))
    assert(out.columns.toSeq == Seq("_1", "_2"))
    assert(out.count() == 2)
  }

  test("distinct") {
    val df = Seq("a", "b", "a", "c").toDF("c")
    val out = GraftEngine.sql("SELECT DISTINCT c FROM stream", Map("stream" -> df))
    assert(out.count() == 3)
  }

  test("case when + group by scalar key") {
    val out = run(
      "SELECT upper(deviceId) AS d, sum(CASE WHEN temperature > 25 THEN 1 ELSE 0 END) AS hot " +
        "FROM stream GROUP BY upper(deviceId) ORDER BY d")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("D1", 2L), ("D2", 1L)))
  }

  test("order-sensitive aggregates: first/last/collect/merge/nth") {
    val out = run(
      "SELECT deviceId, first_value(temperature) AS f, last_value(temperature) AS l, " +
        "merge_agg(status) AS m, nth_value(temperature, 2) AS n2 FROM stream " +
        "GROUP BY deviceId WITH (TIMESTAMP='ts') ORDER BY deviceId")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("d1", 20.0, 40.0, "active,active,off", 30.0),
      ("d2", 10.0, 50.0, "active,active", 50.0)))
  }

  test("null handling in aggregates and where") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", None))
      .toDF("k", "v")
    val out = GraftEngine.sql(
      "SELECT k, count(*) AS c, count(v) AS cv, avg(v) AS a FROM stream GROUP BY k ORDER BY k",
      Map("stream" -> df))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 2L, 1L), ("b", 1L, 0L)))
  }

  test("session window") {
    val out = run(
      "SELECT deviceId, count(*) AS c FROM stream " +
        "GROUP BY deviceId, SessionWindow('3s') WITH (TIMESTAMP='ts', TIMEUNIT='ms') " +
        "ORDER BY deviceId, c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // d1: 1000,2000 then gap to 6000 → sessions [2,1]; d2: 1500 | 7000 → [1,1]
    assert(out.toSeq == Seq(("d1", 1L), ("d1", 2L), ("d2", 1L), ("d2", 1L)))
  }

  test("sliding window") {
    val out = run(
      "SELECT count(*) AS c FROM stream GROUP BY SlidingWindow('4s','2s') " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms') ORDER BY c DESC LIMIT 1")
      .collect().map(_.getLong(0))
    assert(out.head == 3L) // window [0,4s) contains ts 1000,1500,2000
  }
}
