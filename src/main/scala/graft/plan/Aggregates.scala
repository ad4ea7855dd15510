package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sql._

/** Dialect aggregate → Spark aggregate lowering
  * (reference: functions/functions_aggregation.go — registration sites cited
  * in SURVEY.md §2.4).
  *
  * Order-sensitive aggregates (first/last/nth/collect/merge_agg) take the
  * query's event order (`ord`): the reference feeds rows to accumulators in
  * arrival order (aggregator/group_aggregator.go:161-280), which in a
  * distributed plan must be made explicit. With an order column they lower to
  * min_by/max_by or sorted collect_list — all native, codegen-friendly
  * Catalyst aggregates (no UDAFs).
  */
object Aggregates {

  def build(fc: FuncCall, buildArg: SqlExpr => Column, ord: Option[Column]): Column = {
    def a0: Column = buildArg(fc.args.head)
    def a1: Column = buildArg(fc.args(1))

    /** values collected in event order: transform(array_sort(struct(ord,v)), .v) */
    def orderedValues: Column = ord match {
      case Some(o) =>
        transform(
          array_sort(collect_list(when(a0.isNotNull, struct(o.as("o"), a0.as("v"))))),
          x => x.getField("v"))
      case None => collect_list(a0)
    }

    fc.lname match {
      case "sum"   => sum(a0)
      case "avg"   => avg(a0)
      case "min"   => min(a0)
      case "max"   => max(a0)
      case "count" =>
        if (fc.args == List(Star)) count(lit(1)) // count(*) (rsql/ast.go:1125-1128)
        else if (fc.distinct) count_distinct(a0)
        else count(a0)

      // population vs sample variants (functions_aggregation.go:399,813,933,1022)
      case "stddev"  => stddev_pop(a0)
      case "stddevs" => stddev_samp(a0)
      case "var"     => var_pop(a0)
      case "vars"    => var_samp(a0)

      case "median"     => median(a0) // exact (functions_aggregation.go:486)
      case "percentile" => percentile(a0, a1) // exact (functions_aggregation.go:518)

      case "collect" => orderedValues // functions_aggregation.go:564

      // first/last seen in window; with event order → min_by/max_by
      // (functions_aggregation.go:620,682; NULL policy group_aggregator.go:155-159)
      case "first_value" => ord.map(o => min_by(a0, o)).getOrElse(first(a0))
      case "last_value"  => ord.map(o => max_by(a0, o)).getOrElse(last(a0))

      // comma-joined string of values in arrival order (functions_aggregation.go:737-790)
      case "merge_agg" => array_join(transform(orderedValues, _.cast("string")), ",")

      // distinct values, first-seen order (functions_aggregation.go:900)
      case "deduplicate" => array_distinct(orderedValues)

      // n-th value in window, 1-based; NULL when the window is shorter
      // (functions/functions_window.go:232 — try_element_at: ANSI element_at
      // raises on out-of-bounds)
      case "nth_value" =>
        val n = fc.args(1) match {
          case nl: NumberLit => nl.toLong.toInt
          case other => throw new IllegalArgumentException(s"nth_value index: $other")
        }
        try_element_at(orderedValues, lit(n))

      // Spark-first surface extensions
      case "count_distinct"        => count_distinct(a0)
      case "approx_count_distinct" => approx_count_distinct(a0)
      case "percentile_approx"     => percentile_approx(a0, a1, lit(10000))
      case "corr"                  => corr(a0, a1)
      case "covar_pop"             => covar_pop(a0, a1)
      case "covar_samp"            => covar_samp(a0, a1)
      case "skewness"              => skewness(a0)
      case "kurtosis"              => kurtosis(a0)

      case other =>
        call_function(other, fc.args.map(buildArg): _*)
    }
  }
}
