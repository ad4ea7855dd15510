package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: A/B the corpus-global dup-span window at 20M docs across
  * shuffle-partition settings — the per-partition external sort is the
  * suspected spill bottleneck on local[32]. */
object DupSpansTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def synthDocs(m: Long) = {
      val seed = col("id") % lit(math.max(1L, m * 9 / 10))
      spark.range(m).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"))
    }
    // warm-up
    operators.TextOps.dupSpans(synthDocs(n / 10), n = 8)
      .write.format("noop").mode("overwrite").save()
    for (init <- Seq("512", "32")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      val t0 = System.nanoTime()
      operators.TextOps.dupSpans(synthDocs(n), n = 8)
        .write.format("noop").mode("overwrite").save()
      println(f"initParts $init%4s: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
