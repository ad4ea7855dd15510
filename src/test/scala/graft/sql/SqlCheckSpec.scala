package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftEngine, SparkTestBase}

/** Validation corpus — SQL the engine must REJECT, with near-miss variants
  * that must be accepted (mirrors the reference's parse-time check catalog,
  * reference: test/e2e/sql_check_test.go:10-33). Rejections surface at
  * parse or plan-build time, never as a wrong result.
  */
class SqlCheckSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val stream =
    Seq(("d1", 10.0, 1000L)).toDF("deviceId", "temperature", "ts")

  private def mustReject(sql: String): Throwable =
    intercept[Exception](GraftEngine.sql(sql, Map("stream" -> stream)))

  private def mustAccept(sql: String): Unit =
    GraftEngine.sql(sql, Map("stream" -> stream)) // builds without throwing

  test("aggregate calls are illegal in WHERE") {
    mustReject("SELECT deviceId, sum(temperature) AS s FROM stream " +
      "WHERE sum(temperature) > 10 GROUP BY deviceId")
    mustAccept("SELECT deviceId, sum(temperature) AS s FROM stream " +
      "GROUP BY deviceId HAVING sum(temperature) > 10")
  }

  test("bare * is only legal as count(*) or SELECT *") {
    mustReject("SELECT deviceId, sum(*) AS s FROM stream GROUP BY deviceId")
    mustAccept("SELECT deviceId, count(*) AS c FROM stream GROUP BY deviceId")
    mustAccept("SELECT * FROM stream")
  }

  test("negative LIMIT and trailing garbage are parse errors") {
    intercept[ParseException](Parser.parse("SELECT a FROM stream LIMIT -1"))
    intercept[ParseException](Parser.parse("SELECT a FROM stream extra garbage ("))
    // trailing set-op input routes through parseStatement, not parse
    intercept[ParseException](
      Parser.parse("SELECT a FROM stream UNION SELECT a FROM stream"))
  }

  test("unknown tables are rejected with the registry listed") {
    val e = mustReject("SELECT x FROM nonexistent")
    assert(e.getMessage.contains("nonexistent"))
  }

  test("ROLLUP/CUBE parse as grouping styles, not window functions") {
    // window + rollup cannot be combined in one GROUP BY by the grammar;
    // the planner's require is a second line of defense
    mustAccept("SELECT deviceId, count(*) AS c FROM stream GROUP BY ROLLUP(deviceId)")
    mustAccept("SELECT deviceId, count(*) AS c FROM stream GROUP BY CUBE(deviceId)")
  }

  test("analytics and aggregates in ORDER BY must be aliased in SELECT") {
    mustReject("SELECT deviceId FROM stream " +
      "ORDER BY lag(temperature) OVER (PARTITION BY deviceId)")
    mustAccept("SELECT deviceId, lag(temperature) OVER (PARTITION BY deviceId) AS p " +
      "FROM stream ORDER BY p")
  }

  test("CountingWindow requires a deterministic event order") {
    val noTs = Seq(("d1", 10.0)).toDF("deviceId", "temperature")
    intercept[Exception] {
      GraftEngine.sql("SELECT deviceId, sum(temperature) AS s FROM stream " +
        "GROUP BY deviceId, CountingWindow(2)", Map("stream" -> noTs))
    }
  }

  test("changed_cols requires at least one column argument") {
    mustReject("SELECT changed_cols('p_', true) OVER (PARTITION BY deviceId) FROM stream")
  }

  test("runtime expr() rejected where no row context exists, accepted in SELECT") {
    // ORDER BY builds against projected output columns — no source row struct
    mustReject("SELECT deviceId FROM stream ORDER BY expr(deviceId)")
    mustAccept("SELECT deviceId, expr(concat('temperature * ', '2')) AS d FROM stream")
    mustAccept("SELECT deviceId, expr('temperature * 2') AS d FROM stream")
  }

  test("bad duration units are rejected") {
    mustReject("SELECT deviceId, count(*) AS c FROM stream " +
      "GROUP BY deviceId, TumblingWindow('5parsecs') WITH (TIMESTAMP='ts')")
  }

  test("unknown functions are rejected at plan time with a suggestion") {
    val e = intercept[IllegalArgumentException] {
      GraftEngine.sql("SELECT absx(temperature) AS a FROM stream",
        Map("stream" -> stream))
    }
    assert(e.getMessage.contains("Unknown function 'absx'"), e.getMessage)
    assert(e.getMessage.contains("Did you mean 'abs'?"), e.getMessage)
    // a registered UDF immediately resolves through the same path
    graft.api.StreamSql(spark).registerFunction("graft_check_fn", (x: Double) => x + 1)
    assert(GraftEngine.sql("SELECT graft_check_fn(temperature) AS a FROM stream",
      Map("stream" -> stream)).count() > 0)
  }

  test("unsupported analytic names fail at plan time, not silently") {
    mustReject("SELECT no_such_analytic(temperature) " +
      "OVER (PARTITION BY deviceId) AS x FROM stream")
  }
}
