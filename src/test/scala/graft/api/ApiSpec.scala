package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.SparkTestBase

/** Facade surface: table registry, custom scalar/aggregate functions, and
  * the changed_cols fan-out (reference: streamsql.go API + registry). */
class ApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("Spark registry passthrough surfaces sketch aggregates in dialect SQL") {
    // approx_count_distinct (HLL++) and the DataSketches HLL pair reach
    // dialect SQL through the call_function fallthrough — the mergeable
    // sketches a 100 TB cardinality report actually uses
    val ss = StreamSql(spark)
    ss.registerTable("stream",
      (1 to 100).map(i => (i % 10, i.toLong)).toDF("g", "v"))
    val approx = ss.execute(
      "SELECT approx_count_distinct(v) AS c FROM stream")
      .collect()(0).getLong(0)
    assert(approx >= 95 && approx <= 105, s"approx=$approx") // 100 distinct
    val hll = ss.execute(
      "SELECT hll_sketch_estimate(hll_sketch_agg(v)) AS c FROM stream")
      .collect()(0).getLong(0)
    assert(hll >= 95 && hll <= 105, s"hll=$hll")
  }

  test("execute over registered tables with lookup join") {
    val ss = StreamSql(spark)
    ss.registerTable("stream",
      Seq(("d1", 20.0, 1000L), ("d2", 30.0, 2000L)).toDF("deviceId", "temp", "ts"))
    ss.registerTable("meta", Seq(("d1", "plantA")).toDF("deviceId", "location"))
    val out = ss.execute(
      "SELECT deviceId, m.location FROM stream JOIN meta m ON deviceId = m.deviceId")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("d1", "plantA")))
  }

  test("custom scalar function callable from dialect SQL") {
    val ss = StreamSql(spark)
    ss.registerFunction[Double, Double]("f2c", (f: Double) => (f - 32) / 1.8)
    ss.registerTable("stream", Seq(("d1", 212.0)).toDF("deviceId", "temperature"))
    val out = ss.execute("SELECT deviceId, round(f2c(temperature), 2) AS c FROM stream")
    assert(out.collect().head.getDouble(1) == 100.0)
  }

  test("custom aggregator callable from dialect SQL") {
    // the reference's AggregatorFunction{New,Add,Result} contract
    val geoMean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)) = if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val ss = StreamSql(spark)
    ss.registerAggregator("geo_mean", geoMean)
    ss.registerTable("stream",
      Seq(("a", 2.0), ("a", 8.0), ("b", 3.0)).toDF("k", "v"))
    val out = ss.execute("SELECT k, round(geo_mean(v), 4) AS g FROM stream GROUP BY k ORDER BY k")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 4.0), ("b", 3.0)))
  }

  test("sha1/sha512 match the JDK digests (no DuckDB oracle available)") {
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(("abc"), ("graft")).toDF("s"))
    def jdk(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = ss.execute("SELECT s, sha1(s) AS h1, sha512(s) AS h5 FROM stream")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    Seq("abc", "graft").foreach { s =>
      assert(got(s) == (jdk("SHA-1", s), jdk("SHA-512", s)))
    }
  }

  test("changed_cols fans out with prefix and suppresses all-empty rows") {
    val df = Seq(
      ("d1", 20.0, "on", 1000L),
      ("d1", 20.0, "on", 2000L),  // nothing changed → suppressed
      ("d1", 25.0, "on", 3000L),  // temp changed
      ("d1", 25.0, "off", 4000L)  // status changed
    ).toDF("deviceId", "temp", "status", "ts")
    val out = graft.GraftEngine.sql(
      "SELECT ts, changed_cols('chg_', true, temp, status) OVER (PARTITION BY deviceId) " +
        "FROM stream ORDER BY ts", df)
    assert(out.columns.toSeq == Seq("ts", "chg_temp", "chg_status"))
    val rows = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getDouble(1),
      if (r.isNullAt(2)) null else r.getString(2)))
    assert(rows.toSeq == Seq(
      (1000L, 20.0, "on"), (3000L, 25.0, null), (4000L, null, "off")))
  }

  test("custom analytic (EMA) registered and run per partition key") {
    class Ema(alpha: Double) extends graft.functions.CustomAnalytic {
      private var s: Double = Double.NaN
      def apply(v: Any): Any = {
        val x = graft.cep.RowEval.toDouble(v)
        s = if (s.isNaN) x else alpha * x + (1 - alpha) * s
        s
      }
    }
    val ss = StreamSql(spark)
    ss.registerAnalytic("ema5", () => new Ema(0.5))
    val df = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 20.0, 3L),
      ("b", 4.0, 1L)
    ).toDF("g", "v", "ts")
    val out = graft.GraftEngine.sql(
      "SELECT g, ts, ema5(v) OVER (PARTITION BY g) AS e FROM stream " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms') ORDER BY g, ts", df)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, 17.5), ("b", 1L, 4.0)))
  }

  test("had_changed(true, *) compares the whole row by column name") {
    val df = Seq(
      ("d1", 20.0, "on", 1000L),
      ("d1", 20.0, "on", 2000L),  // only ts differs — still a whole-row change
      ("d1", 25.0, "on", 3000L)
    ).toDF("deviceId", "temp", "status", "ts")
    val out = graft.GraftEngine.sql(
      "SELECT ts, had_changed(true, *) OVER (PARTITION BY deviceId) AS h " +
        "FROM stream ORDER BY ts", df)
    // ts is part of the row, so every event differs from its predecessor —
    // matching the reference's named-row comparison over the full map
    assert(out.collect().map(_.getBoolean(1)).forall(identity))
    // excluding the changing columns: only the first row reports a change
    val out2 = graft.GraftEngine.sql(
      "SELECT ts, had_changed(true, deviceId, status) OVER (PARTITION BY deviceId) AS h " +
        "FROM stream ORDER BY ts", df)
    assert(out2.collect().map(_.getBoolean(1)).toSeq == Seq(true, false, false))
  }

  test("acc_sum with start and reset conditions (batch lowering)") {
    // acc_sum(v, startCond, resetCond): gated start, reset clears the run
    // (reference: functions/analytic_acc.go)
    val df = Seq(
      ("k", 1.0, 1L), ("k", 2.0, 2L), // before start (v>=2 starts at row 2)
      ("k", 3.0, 3L), ("k", -1.0, 4L), // reset at v<0
      ("k", 5.0, 5L)
    ).toDF("g", "v", "ts")
    val out = graft.GraftEngine.sql(
      "SELECT ts, acc_sum(v, v >= 2, v < 0) OVER (PARTITION BY g) AS s FROM stream ORDER BY ts", df)
    val got = out.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // row1: not started → null; row2: start, 2; row3: 5; row4: reset seg, -1; row5: 4
    assert(got.toSeq == Seq((1L, null), (2L, 2.0), (3L, 5.0), (4L, -1.0), (5L, 4.0)))
  }

  test("= nil / != null are null tests, not three-valued equality") {
    // reference: test/e2e/null_test.go:696-707 — Go-nil comparison keeps
    // rows whose field IS NULL (SQL equality would drop every row)
    val df = Seq(("s1", Some(25.5)), ("s2", None), ("s3", Some(30.0)), ("s4", None))
      .toDF("deviceId", "value")
    def ids(sql: String): Seq[String] =
      graft.GraftEngine.sql(sql, df).collect().map(_.getString(0)).sorted.toSeq
    assert(ids("SELECT deviceId FROM stream WHERE value = nil") == Seq("s2", "s4"))
    assert(ids("SELECT deviceId FROM stream WHERE value != nil") == Seq("s1", "s3"))
    assert(ids("SELECT deviceId FROM stream WHERE value = null") == Seq("s2", "s4"))
    assert(ids("SELECT deviceId FROM stream WHERE value != null AND value > 26") == Seq("s3"))
    // CEP DEFINE path shares the semantics
    val cep = graft.GraftEngine.sql(
      "SELECT c FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES COUNT(*) AS c ONE ROW PER MATCH PATTERN (A+) WITHIN '1h' " +
        "DEFINE A AS v = nil )",
      Seq((1L, Some(1.0)), (2L, None), (3L, None), (4L, Some(2.0)))
        .toDF("ts", "v"))
    assert(cep.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("map-payload tables resolve unknown identifiers as map keys") {
    // schema-less ingestion escape hatch (reference accepts arbitrary map
    // rows, types/row.go:27-31): identifiers that match no declared column
    // read from the first map<string,_> column; missing keys are null
    val df = Seq(
      ("d1", Map("temperature" -> "21.5", "status" -> "on"), 1000L),
      ("d2", Map("temperature" -> "9.0"), 2000L)
    ).toDF("deviceId", "payload", "ts")
    val out = graft.GraftEngine.sql(
      "SELECT deviceId, cast(temperature, 'float64') AS t, status " +
        "FROM stream WHERE cast(temperature, 'float64') > 10 ORDER BY ts", df)
    val got = out.collect().map(r =>
      (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(got.toSeq == Seq(("d1", 21.5, "on")))
    // declared columns always win over map keys; missing key → null row value
    val out2 = graft.GraftEngine.sql(
      "SELECT deviceId, status FROM stream ORDER BY ts", df)
    assert(out2.collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq(("d1", "on"), ("d2", null)))
  }
}
