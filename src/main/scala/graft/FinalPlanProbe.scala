package graft

import org.apache.spark.sql.SparkSession

/** Dev main (r15): execute named SparkEntry queries and print the FINAL
  * (post-AQE) plan's node census — the only place runtime exchange/stage
  * reuse is visible (`explain` before execution shows the initial plan).
  *
  *   sbt "runMain graft.FinalPlanProbe /root/testdata/sf0.1 q_keywords_tfidf,q_bm25"
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qmap = SparkEntry.queries
    names.foreach { name =>
      val df = qmap(name)(spark, sfDir)
      df.collect() // executes THIS QueryExecution so AQE finalizes it
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).size
      println(s"$name FINAL: shuffleStages=${c("ShuffleQueryStage")} " +
        s"reusedStages=${c("ReusedQueryStage|ReusedExchange")} " +
        s"exchanges=${c("Exchange hashpartitioning")} " +
        s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
        s"shj=${c("ShuffledHashJoin")}")
      if (args.length > 2 && args(2) == "dump") println(p)
    }
    spark.stop()
  }
}
