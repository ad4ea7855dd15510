package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.{GraftEngine, SparkTestBase, Tables}

case class PEv(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts: Long)

/** Streaming/batch parity: the SAME dialect query over the SAME rows must
  * produce the same result through the streaming lowering (MemoryStream,
  * 3 micro-batches) as through the batch lowering. This is the
  * differential layer SURVEY §5 plans on top of the DuckDB oracle: the
  * oracle pins batch correctness, parity extends it to streaming.
  *
  * Sentinel rows (far-future ts, per key where needed) advance the
  * event-time watermark / per-key CEP horizons so every real window
  * flushes; both sides see the identical input, so sentinels cannot skew
  * the comparison (their own unflushed windows are filtered identically).
  */
class StreamBatchParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Day = 86400000L

  // sf0.001 events (1000 rows, 15 users) as epoch-ms tuples
  private lazy val realRows: Seq[PEv] = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, "/root/testdata/sf0.001")("events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_millis(col("ts")).as("ts"))
      .as[PEv].collect().toSeq.sortBy(e => (e.ts, e.event_id))
  }
  private lazy val realMaxTs: Long = realRows.map(_.ts).max

  // far-future sentinels per (user × event_type): the stateful operators
  // track a PER-KEY watermark (key = the query's group/partition columns,
  // user_id or event_type), so every key must see a sentinel for its open
  // windows to flush. value 0 never satisfies the CEP condition; sentinel
  // rows land in their own far-future windows, filtered identically on
  // both sides via ws <= realMaxTs.
  private lazy val sentinels: Seq[PEv] = {
    val users = realRows.map(_.user_id).distinct.sorted
    val types = realRows.map(_.event_type).distinct.sorted
    (for { (u, i) <- users.zipWithIndex; (t, j) <- types.zipWithIndex }
      yield PEv(10_000_000L + i * 100 + j, u, t, 0.0, realMaxTs + 200 * Day)).toSeq
  }
  private lazy val allRows: Seq[PEv] = realRows ++ sentinels

  private def batchDf: DataFrame = allRows.toDF()

  private def runStreaming(sql: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PEv]
    val out = GraftEngine.sql(sql, Map("stream" -> mem.toDF()))
    val name = s"parity${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    allRows.grouped(math.max(1, allRows.size / 3)).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    SparkTestBase.stopQuietly(q)
    spark.table(name)
  }

  /** Rows → order-independent multiset fingerprint. */
  private def fingerprint(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .groupBy(identity).view.mapValues(_.length).toMap

  private def assertParity(sql: String, post: DataFrame => DataFrame = identity): Unit = {
    val batch = fingerprint(post(GraftEngine.sql(sql, Map("stream" -> batchDf))))
    val stream = fingerprint(post(runStreaming(sql)))
    assert(batch.nonEmpty, "batch side produced no rows — vacuous parity")
    assert(stream == batch,
      s"streaming/batch divergence:\nonly-batch=${(batch.toSet -- stream.toSet).take(5)}" +
        s"\nonly-stream=${(stream.toSet -- batch.toSet).take(5)}")
  }

  private val opts = "WITH (TIMESTAMP='ts', TIMEUNIT='ms', TIEBREAK='event_id', " +
    "MAXOUTOFORDERNESS='60d')"

  test("parity: tumbling window aggregation") {
    assertParity(
      "SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv, " +
        s"window_start() AS ws FROM stream GROUP BY event_type, TumblingWindow('1d') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: session window aggregation") {
    assertParity(
      "SELECT user_id, count(*) AS cnt, window_start() AS ws FROM stream " +
        s"GROUP BY user_id, SessionWindow('1h') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: counting window (stateful operator)") {
    assertParity(
      "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM stream " +
        s"GROUP BY user_id, CountingWindow(5) $opts")
  }

  test("parity: counting window sum over an integer column keeps its type") {
    assertParity(
      "SELECT user_id, sum(event_id) AS se, count(*) AS c FROM stream " +
        s"GROUP BY user_id, CountingWindow(7) $opts")
  }

  test("parity: global window fire-and-purge") {
    assertParity(
      "SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS sv FROM stream " +
        s"GROUP BY user_id, GLOBAL WINDOW TRIGGER WHEN count(*) >= 3 $opts")
  }

  test("parity: direct-path analytics (lag / acc_sum / had_changed)") {
    assertParity(
      "SELECT user_id, event_id, round(value - lag(value, 1, 0) OVER (PARTITION BY user_id), 2) AS dv, " +
        "round(acc_sum(value) OVER (PARTITION BY user_id), 2) AS rs, " +
        "had_changed(true, event_type) OVER (PARTITION BY user_id) AS h " +
        s"FROM stream $opts")
  }

  test("parity: sliding window aggregation") {
    assertParity(
      "SELECT count(*) AS cnt, round(avg(value), 4) AS av, window_start() AS ws " +
        s"FROM stream GROUP BY SlidingWindow('1d', '12h') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: cross-window analytics on counting windows (combined stateful op)") {
    assertParity(
      "SELECT user_id, round(avg(value), 4) AS av, " +
        "round(acc_sum(avg(value)), 4) AS running FROM stream " +
        s"GROUP BY user_id, CountingWindow(10) $opts")
  }

  test("parity: cross-window analytics on tumbling windows") {
    // streaming routes through tumblingWindowAnalytics (one operator owns
    // window buffers + analytic state); batch uses groupBy + window funcs.
    // Sentinel windows are far-future with sum 0, so filtering them AFTER
    // the running sum leaves the real chain untouched on both sides.
    assertParity(
      "SELECT event_type, round(sum(value), 2) AS sv, " +
        "round(acc_sum(sum(value)), 2) AS run, window_start() AS ws FROM stream " +
        s"GROUP BY event_type, TumblingWindow('5d') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: WHEN-gated analytic replay") {
    assertParity(
      "SELECT user_id, event_id, lag(value) " +
        "OVER (PARTITION BY user_id WHEN event_type = 'click') AS pv " +
        s"FROM stream $opts")
  }

  test("parity: changed_col row suppression") {
    assertParity(
      "SELECT user_id, event_id, changed_col(true, event_type) " +
        s"OVER (PARTITION BY user_id) AS chg FROM stream $opts")
  }

  test("parity: cross-window analytics on sliding windows") {
    assertParity(
      "SELECT user_id, round(sum(value), 2) AS sv, " +
        "round(acc_sum(sum(value)), 2) AS run, window_start() AS ws FROM stream " +
        s"GROUP BY user_id, SlidingWindow('2d', '1d') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: cross-window analytics on session windows") {
    assertParity(
      "SELECT user_id, count(*) AS cnt, " +
        "round(acc_sum(count(*)), 2) AS run, window_start() AS ws FROM stream " +
        s"GROUP BY user_id, SessionWindow('1h') $opts",
      _.filter(org.apache.spark.sql.functions.col("ws") <= realMaxTs))
  }

  test("parity: MATCH_RECOGNIZE overlapping skip (TO NEXT ROW)") {
    // exercises CepStream's conservative consumption under overlapping
    // skip modes (only the safe prefix drops)
    assertParity(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(A.ts) - 0 AS t0, LAST(A.value) AS lastv " +
        "ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW PATTERN (A{3}) WITHIN '60d' " +
        s"DEFINE A AS value > 50 ) $opts")
  }

  test("parity: MATCH_RECOGNIZE ALL ROWS PER MATCH") {
    // exercises CepStream's per-row emission (emitMatch ALL ROWS path)
    assertParity(
      "SELECT user_id, value, mn, cls FROM stream MATCH_RECOGNIZE ( " +
        "PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls ALL ROWS PER MATCH " +
        s"PATTERN (A{3}) WITHIN '60d' DEFINE A AS value > 50 ) $opts")
  }

  test("parity: MATCH_RECOGNIZE (A{3} spike run)") {
    assertParity(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, LAST(A.value) AS lastv, FIRST(A.ts) - 0 AS t0 " +
        "ONE ROW PER MATCH PATTERN (A{3}) WITHIN '60d' DEFINE A AS value > 50 ) " +
        s"$opts")
  }

  test("parity: windowed rate anomalies (batch window vs stateful stream)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Events
    // per-type far-future sentinels close every real bucket on the
    // stream side; their own (still-open / filtered) buckets are cut by
    // the bucket_start <= realMax bound on both sides
    val sent = realRows.map(_.event_type).distinct.sorted.zipWithIndex.map {
      case (t, j) => PEv(20_000_000L + j, 0L, t, 0.0, realMaxTs + 200 * Day)
    }
    val all = realRows ++ sent
    val maxBucket = realMaxTs / 1000
    def shape(df: DataFrame): Map[(String, Long), (Long, Option[Double], Boolean)] =
      df.filter(col("bucket_start") <= maxBucket).collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            r.getBoolean(4)))
      }.toMap
    val batch = shape(Events.rateAnomalies(
      all.toDF().select(col("event_type"), timestamp_millis(col("ts")).as("ts")),
      Seq("event_type"), bucketSec = 3600L))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PEv]
    val out = Events.rateAnomaliesStream(
      mem.toDF().select(col("event_type"), timestamp_millis(col("ts")).as("ts")),
      "event_type", bucketSec = 3600L)
    val name = s"rateparity${System.nanoTime()}"
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    all.grouped(math.max(1, all.size / 3)).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    SparkTestBase.stopQuietly(q)
    val stream = shape(spark.table(name))
    assert(batch.keySet == stream.keySet && batch.nonEmpty,
      s"bucket sets differ: ${(batch.keySet diff stream.keySet).take(3)} / " +
        s"${(stream.keySet diff batch.keySet).take(3)}")
    batch.foreach { case (k, (n, z, flag)) =>
      val (sn, sz, sflag) = stream(k)
      assert(n == sn && flag == sflag, s"$k: ($n,$z,$flag) vs ($sn,$sz,$sflag)")
      (z, sz) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6, s"$k: z $a vs $b")
        case (a, b) => assert(a == b, s"$k: z $a vs $b")
      }
    }
  }
}
