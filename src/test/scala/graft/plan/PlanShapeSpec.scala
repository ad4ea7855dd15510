package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftEngine, SparkTestBase, Tables}

/** Physical-plan shape pins — the scale guarantees README §"Design for
  * scale" claims, asserted against `explain` output so a regression that
  * silently drops pushdown, broadcast, or top-k shows up as a test failure
  * (not just a slower benchmark).
  *
  * The reference hand-codes its only optimization (filter-before-window,
  * reference: stream/processor_data.go:93-104); here the equivalents are
  * Catalyst's and these tests keep them engaged.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  lazy val tables = Tables.load(spark, "/root/testdata/sf0.001")

  private def planOf(sql: String): String =
    GraftEngine.sql(sql, tables).queryExecution.executedPlan.toString

  test("filters and column pruning reach the parquet scan") {
    val p = planOf(
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("GreaterThan(l_quantity,45"), s"predicate not pushed:\n$p")
    // pruned read schema: only the two referenced columns reach the scan
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan not pruned to referenced columns:\n$p")
  }

  test("enrichment joins broadcast the dimension side (no stream shuffle)") {
    val p = planOf(
      "SELECT l_orderkey, s.s_name FROM lineitem " +
        "JOIN supplier s ON l_suppkey = s.s_suppkey")
    assert(p.contains("BroadcastHashJoin"), s"join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join shuffled:\n$p")
  }

  test("ORDER BY + LIMIT lowers to top-k (TakeOrderedAndProject)") {
    val p = planOf(
      "SELECT l_orderkey, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC LIMIT 10")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator:\n$p")
  }

  test("aggregation uses partial (map-side) combine before the shuffle") {
    val p = planOf(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag")
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregation:\n$p")
  }

  test("scalar library stays inside whole-stage codegen") {
    val df = GraftEngine.sql(
      "SELECT upper(l_returnflag) AS u, abs(l_discount - 0.05) AS a, " +
        "round(sqrt(l_quantity), 4) AS q FROM lineitem WHERE l_partkey < 100",
      tables)
    val p = df.queryExecution.executedPlan.toString
    // the "*(n)" stage marker is how codegen'd operators print; a scalar
    // falling back to an interpreted UDF would drop the star on Project
    assert(p.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      s"projection fell out of codegen:\n$p")
  }
}
