package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: A/B the distributed connected-components smoke across
  * shuffle-partition settings — local iteration on the
  * cc_distributed_*_sec scale-smoke entries. */
object CcTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def chainEdges(m: Long) = spark.range(m)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    for (pass <- 1 to 2; parts <- Seq("8", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      operators.Dedup.connectedComponents(chainEdges(n), localThreshold = 0L)
        .write.format("noop").mode("overwrite").save()
      println(f"pass $pass parts $parts%3s: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
