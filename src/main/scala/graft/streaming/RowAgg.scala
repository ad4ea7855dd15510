package graft.streaming

import graft.sql._
import graft.cep.RowEval

/** Row-level aggregate computation for the stateful operators (counting
  * windows buffer rows; global windows keep O(1) running state — matching
  * the reference's AggregatorFunction New/Add/Result contract,
  * reference: functions/aggregator_types.go:74-80).
  */
object RowAgg {

  /** Buffered-window aggregate over values in arrival order
    * (counting window path, reference: aggregator/group_aggregator.go:161-280). */
  def overBuffer(name: String, values: Seq[Any], extraArg: Option[Double]): Any = {
    val nn = values.filter(_ != null)
    def ds = nn.map(RowEval.toDouble)
    name.toLowerCase match {
      case "count"       => nn.size.toLong
      case "count_star"  => values.size.toLong
      case "sum"         => if (nn.isEmpty) null else ds.sum
      case "avg"         => if (nn.isEmpty) null else ds.sum / nn.size
      case "min"         => if (nn.isEmpty) null else nn.minBy(RowEval.toDouble)
      case "max"         => if (nn.isEmpty) null else nn.maxBy(RowEval.toDouble)
      case "stddev"      => popVar(ds).map(math.sqrt).orNull
      case "stddevs"     => sampVar(ds).map(math.sqrt).orNull
      case "var"         => popVar(ds).orNull
      case "vars"        => sampVar(ds).orNull
      case "median"      => percentileOf(ds, 0.5)
      case "percentile"  => percentileOf(ds, extraArg.getOrElse(0.5))
      case "collect"     => nn
      case "first_value" => values.headOption.orNull
      case "last_value"  => values.lastOption.orNull
      case "merge_agg"   => if (nn.isEmpty) null else nn.map(_.toString).mkString(",")
      case "deduplicate" => nn.distinct
      case "nth_value" =>
        val n = extraArg.getOrElse(1.0).toInt
        if (n >= 1 && n <= nn.size) nn(n - 1) else null
      case other => throw new IllegalArgumentException(s"unsupported window aggregate $other")
    }
  }

  private def popVar(ds: Seq[Double]): Option[Double] =
    if (ds.isEmpty) None
    else {
      val m = ds.sum / ds.size
      Some(ds.map(x => (x - m) * (x - m)).sum / ds.size)
    }

  private def sampVar(ds: Seq[Double]): Option[Double] =
    if (ds.size < 2) None
    else {
      val m = ds.sum / ds.size
      Some(ds.map(x => (x - m) * (x - m)).sum / (ds.size - 1))
    }

  /** Exact interpolated percentile (matches Spark/DuckDB quantile_cont). */
  private def percentileOf(ds: Seq[Double], p: Double): Any =
    if (ds.isEmpty) null
    else {
      val s = ds.sorted
      val pos = (s.size - 1) * p
      val lo = pos.toInt
      val hi = math.min(lo + 1, s.size - 1)
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }

  /** O(1) running aggregate state — the only kind a GLOBAL window may use
    * (reference: window/global_window.go:50-58 — no row buffer). */
  final case class Running(
      var count: Long = 0,
      var nonNull: Long = 0,
      var sum: Double = 0,
      var min: Double = Double.NaN,
      var max: Double = Double.NaN,
      var first: Any = null,
      var last: Any = null) {

    def add(v: Any): Unit = {
      count += 1
      if (v != null) {
        val d = RowEval.toDouble(v)
        nonNull += 1
        sum += d
        if (min.isNaN || d < min) min = d
        if (max.isNaN || d > max) max = d
        if (first == null) first = v
        last = v
      }
    }

    def result(name: String): Any = name.toLowerCase match {
      case "count"      => nonNull
      case "count_star" => count
      case "sum"        => if (nonNull == 0) null else sum
      case "avg"        => if (nonNull == 0) null else sum / nonNull
      case "min"        => if (min.isNaN) null else min
      case "max"        => if (max.isNaN) null else max
      case "first_value" => first
      case "last_value"  => last
      case other => throw new IllegalArgumentException(
        s"GLOBAL window requires O(1) aggregates; '$other' buffers rows " +
          "(reference: window/global_window.go:50-58)")
    }
  }

  /** Which slot name an aggregate call uses in the running path. */
  def runningName(fc: FuncCall): String =
    if (fc.lname == "count" && fc.args == List(Star)) "count_star" else fc.lname
}
