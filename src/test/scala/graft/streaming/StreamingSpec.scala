package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{GraftEngine, SparkTestBase}

case class Ev(deviceId: String, temperature: Double, ts: Long, status: String)

/** Structured-Streaming execution of the same dialect queries: windows with
  * watermarks, stateful counting/global windows, streaming analytics
  * (reference e2e equivalents under test/e2e/window_*_test.go). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private var viewN = 0
  private def runStream(sql: String, rows: Seq[Ev], batches: Int = 1): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = GraftEngine.sql(sql, Map("stream" -> mem.toDF()))
    viewN += 1
    val name = s"out$viewN"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(if (out.isStreaming) "append" else "append").start()
    val per = math.max(1, rows.size / batches)
    rows.grouped(per).foreach { chunk =>
      mem.addData(chunk: _*)
      query.processAllAvailable()
    }
    query.stop()
    spark.table(name)
  }

  test("streaming filter + transform (append, per-record path)") {
    val rows = Seq(Ev("d1", 20, 1000, "a"), Ev("d1", 30, 2000, "a"), Ev("d2", 50, 3000, "b"))
    val out = runStream(
      "SELECT deviceId, temperature * 1.8 + 32 AS f FROM stream WHERE temperature > 25",
      rows)
    assert(out.collect().map(_.getDouble(1)).sorted.toSeq == Seq(86.0, 122.0))
  }

  test("streaming tumbling window with watermark") {
    val rows = (0 until 10).map(i => Ev("d1", i, i * 1000L, "a")) :+
      Ev("d1", 99, 60000L, "a") // advances watermark past the first windows
    val out = runStream(
      "SELECT deviceId, count(*) AS c, window_start() AS ws FROM stream " +
        "GROUP BY deviceId, TumblingWindow('5s') " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms', MAXOUTOFORDERNESS='1s')",
      rows, batches = 3)
    val got = out.collect().map(r => (r.getLong(2), r.getLong(1))).toMap
    assert(got.get(0L).contains(5L))
    assert(got.get(5000L).contains(5L))
  }

  test("streaming counting window fires every n per key") {
    val rows = Seq(
      Ev("d1", 1, 1000, "a"), Ev("d1", 2, 2000, "a"),
      Ev("d2", 10, 1500, "a"),
      Ev("d1", 3, 3000, "a"), Ev("d1", 4, 4000, "a"),
      Ev("d2", 20, 2500, "a"))
    val out = runStream(
      "SELECT deviceId, sum(temperature) AS s, count(*) AS c FROM stream " +
        "GROUP BY deviceId, CountingWindow(2) WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 3)
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(got == Seq(("d1", 3.0), ("d1", 7.0), ("d2", 30.0)))
  }

  test("streaming counting window state spans micro-batches") {
    val rows = Seq(Ev("d1", 1, 1000, "a"), Ev("d1", 2, 2000, "a"), Ev("d1", 3, 3000, "a"))
    // one row per micro-batch; window of 2 must fire mid-stream
    val out = runStream(
      "SELECT deviceId, sum(temperature) AS s FROM stream " +
        "GROUP BY deviceId, CountingWindow(2) WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 3)
    assert(out.collect().map(_.getDouble(1)).toSeq == Seq(3.0))
  }

  test("global window TRIGGER WHEN fires and purges (streaming)") {
    val rows = (1 to 7).map(i => Ev("d1", i, i * 1000L, "a"))
    val out = runStream(
      "SELECT deviceId, count(*) AS c FROM stream " +
        "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN count(*) >= 3 " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 2)
    // fires at rows 3 and 6; purge after each
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(3L, 3L))
  }

  test("global window TRIGGER WHEN in batch mode") {
    val df = (1 to 7).map(i => ("d1", i.toDouble, i * 1000L)).toDF("deviceId", "v", "ts")
    val out = GraftEngine.sql(
      "SELECT deviceId, sum(v) AS s FROM stream " +
        "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN sum(v) > 5 " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')", df)
    // running sums fire-and-purge: 1,3,6→fire(6); 4,9→fire(9); 6→fire(6); 7→fire(7)
    assert(out.collect().map(_.getDouble(1)).toSeq == Seq(6.0, 9.0, 6.0, 7.0))
  }

  test("streaming lag and acc_sum match the batch lowering") {
    val rows = Seq(
      Ev("d1", 20, 1000, "a"), Ev("d1", 30, 2000, "a"), Ev("d1", 40, 3000, "a"),
      Ev("d2", 10, 1500, "a"), Ev("d2", 50, 2500, "a"))
    val sql = "SELECT deviceId, ts, lag(temperature) OVER (PARTITION BY deviceId) AS p, " +
      "acc_sum(temperature) OVER (PARTITION BY deviceId) AS s FROM stream " +
      "WITH (TIMESTAMP='ts', TIMEUNIT='ms')"
    val streamed = runStream(sql, rows, batches = 2)
      .select("deviceId", "ts", "p", "s").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getDouble(3))).sortBy(x => (x._1, x._2))
    val batch = GraftEngine.sql(sql, rows.toDF())
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming changed_col with WHEN gating replay") {
    val rows = Seq(
      Ev("d1", 1, 1000, "on"), Ev("d1", 2, 2000, "on"),
      Ev("d1", 3, 3000, "off"), Ev("d1", 4, 4000, "off"))
    val out = runStream(
      "SELECT deviceId, ts, changed_col(true, status) OVER (PARTITION BY deviceId) AS c " +
        "FROM stream WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 2)
    val got = out.collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    // suppression: rows with null change dropped (reference stream.go:551-567)
    assert(got.toSeq == Seq((1000L, "on"), (3000L, "off")))
  }

  test("streaming MATCH_RECOGNIZE emits finalized matches across batches") {
    // WITHIN '2s' horizon: matches finalize once a row 2s newer arrives
    val rows = Seq(
      Ev("d1", 60, 1000, "a"), Ev("d1", 70, 1500, "a"), // match [1000,1500]
      Ev("d1", 40, 2000, "a"),
      Ev("d1", 80, 5000, "a"), Ev("d1", 90, 5500, "a"), // match [5000,5500]
      Ev("d1", 10, 9000, "a")) // horizon push → finalizes the second match
    val out = runStream(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY deviceId ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, LAST(A.temperature) AS peak ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '2s' DEFINE A AS temperature > 50 ) " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 3)
    val got = out.collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 70.0), (2L, 90.0)))
  }

  test("streaming MATCH_RECOGNIZE greedy match extends past the safety horizon") {
    // rows t=0s,5s then t=15s: with WITHIN '10s' only t=0 is "safe" when
    // t=15 arrives, but the greedy A+ match anchored at t=0 legitimately
    // includes t=5 (5s ≤ 0s+WITHIN) — it must emit [t0,t5], not a
    // truncated [t0]
    val rows = Seq(
      Ev("d1", 60, 0L, "a"), Ev("d1", 70, 5000L, "a"),
      Ev("d1", 80, 15000L, "a"),
      Ev("d1", 0, 30000L, "a")) // below threshold; finalizes the t=15 match
    val out = runStream(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY deviceId ORDER BY ts " +
        "MEASURES FIRST(A.ts) - 0 AS t0, LAST(A.temperature) AS lastv ONE ROW PER MATCH " +
        "PATTERN (A+) WITHIN '10s' DEFINE A AS temperature > 50 ) " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
      rows, batches = 4)
    val got = out.collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 70.0), (15000L, 80.0)))
  }

  test("per-batch ordered sink applies ORDER BY/LIMIT per emitted batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = GraftEngine.sql("SELECT deviceId, temperature FROM stream", mem.toDF())
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    val q = Sinks.orderedBatches(out,
      List(graft.sql.OrderItem(graft.sql.Ident.simple("temperature"), asc = false)),
      Some(2)) { (b, _) => seen += b.collect().map(_.getDouble(1)).toSeq }
      .start()
    mem.addData(Ev("d1", 5, 1, "a"), Ev("d1", 9, 2, "a"), Ev("d1", 7, 3, "a"))
    q.processAllAvailable()
    mem.addData(Ev("d1", 1, 4, "a"), Ev("d1", 3, 5, "a"))
    q.processAllAvailable()
    q.stop()
    assert(seen.filter(_.nonEmpty).toSeq == Seq(Seq(9.0, 7.0), Seq(3.0, 1.0)))
  }
}
