package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev main (r15): reproduce the driver's rule-shape scaling block —
  * the three BASELINE.md rule shapes timed at two core counts in one
  * process (fresh SparkContext per core count), with the bench's exact
  * session settings. PERF_r14 read 8 cores 1.3-2.7× FASTER than 32
  * (rule_analytic 2.65 s @8 vs 7.10 s @32) while every committed
  * artifact has rule_analytic ≈ 0.9 s @32 — this main answers whether
  * that anti-scaling reproduces on a quiet box.
  *
  *   sbt "runMain graft.RuleScaleTune [cpusCsv] [replicate]"
  */
object RuleScaleTune {
  def main(args: Array[String]): Unit = {
    val cpusList = args.headOption.getOrElse("32,8").split(",").toSeq
    val replicate = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val shapes: List[(String, String)] = List(
      "rule_filter" ->
        "SELECT user_id, value FROM stream WHERE value > 25",
      "rule_transform" ->
        "SELECT user_id, value * 1.8 + 32 AS fahrenheit FROM stream",
      "rule_analytic" ->
        ("SELECT user_id, value, lag(value) OVER (PARTITION BY user_id) AS prev " +
          "FROM stream WITH (TIMESTAMP='ts', TIEBREAK='event_id')"))
    cpusList.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-rule-scale-$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val tables0 = Tables.load(spark, "/root/testdata/sf0.1")
      val big = tables0("events")
        .crossJoin(spark.range(replicate).select(col("id").as("__rep")))
        .drop("__rep")
        .repartition(cpus.toInt * 2) // the bench's r15 cache layout
        .cache()
      val rows = big.count()
      println(s"cpus=$cpus stream cache partitions=${big.rdd.getNumPartitions}")
      val tables = tables0 + ("stream" -> big)
      // untimed warm-up pass (JIT/codegen), then median of 3
      shapes.foreach { case (_, sql) =>
        GraftEngine.sql(sql, tables)
          .write.format("noop").mode("overwrite").save()
      }
      shapes.foreach { case (name, sql) =>
        val ds = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          GraftEngine.sql(sql, tables)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"cpus=$cpus%3s $name%-15s median ${ds(1)}%6.3f s  " +
          f"(draws ${ds.map(d => f"$d%.3f").mkString(", ")})  rows=$rows")
      }
      spark.stop()
    }
  }
}
