package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: scale-ratio check for the corpus-global dup-span window.
  * r9: the operator sizes its hash-window shuffle partitions to input
  * volume itself (TextOps.volumeParts — ~170 parts at the 20M label), so
  * this main measures the 2M/20M ratio under the Bench protocol (driver
  * GC between passes so stale shuffle files don't pile up) instead of
  * A/B-ing AQE initialPartitionNum. */
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
    // arg 2: "detect" (default) = dupSpans, "remove" = removeDupSpans —
    // the acting twin shares the hash-window shape plus a rebuild join
    val mode = if (args.length > 1) args(1) else "detect"
    def run(m: Long, parts: Int): Unit = (
      if (mode == "remove")
        operators.TextOps.removeDupSpans(synthDocs(m), n = 8, parts = parts)
      else operators.TextOps.dupSpans(synthDocs(m), n = 8, parts = parts)
      ).write.format("noop").mode("overwrite").save()
    run(n / 10, 0) // warm-up
    System.gc(); Thread.sleep(1000)
    // within-JVM A/B across window partition counts at 20M (0 = the
    // volume-sized default), interleaved twice so box noise can't pick
    // the winner; plus the 2M reference for the scale ratio
    for (pass <- 1 to 2; p <- Seq(32, 0, 512)) {
      val t0 = System.nanoTime()
      run(n, p)
      println(f"$mode%s $n%9d parts=$p%4d pass $pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      System.gc(); Thread.sleep(1000)
    }
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      run(n / 10, 0)
      println(f"$mode%s ${n / 10}%9d parts=auto pass $pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      System.gc(); Thread.sleep(1000)
    }
    spark.stop()
  }
}
