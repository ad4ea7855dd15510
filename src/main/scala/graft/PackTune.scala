package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: A/B the payload-free packSequences rewrite (slim window +
  * shuffled-hash join-back) at 2M vs 20M docs — the r8 smoke measured the
  * payload-riding window sort at 37× time for 10× data; linear (~10×) is
  * the pass condition here. Also prints the volume-sized partition count
  * the operators resolve from plan statistics at each scale. */
object PackTune {
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
    // arg 2 picks the operator: "seq" (default) = packSequences,
    // "chunks" = emitPackedChunks, "emit" = emitPackedIds
    val mode = if (args.length > 1) args(1) else "seq"
    def pack(m: Long): Unit = mode match {
      case "seq" =>
        operators.Packing.packSequences(synthDocs(m), budget = 2048, buckets = 2048)
          .write.format("noop").mode("overwrite").save()
      case other =>
        val ids = synthDocs(m).select(col("doc_id"),
          transform(split(col("text"), " "),
            w => pmod(hash(w), lit(30000)).cast("int")).as("token_ids"))
        val out =
          if (other == "chunks")
            operators.Packing.emitPackedChunks(ids, budget = 2048, buckets = 2048)
          else operators.Packing.emitPackedIds(ids, budget = 2048, buckets = 2048)
        out.write.format("noop").mode("overwrite").save()
    }
    for (m <- Seq(n / 10, n))
      println(s"volumeParts(synthDocs($m)) = " +
        operators.TextOps.volumeParts(synthDocs(m)))
    pack(n / 10) // warm-up
    for (m <- Seq(n / 10, n); pass <- 1 to 3) {
      val t0 = System.nanoTime()
      pack(m)
      println(f"pack $m%9d pass $pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // driver GC kicks ContextCleaner: stale shuffle files from the
      // previous pass are removed instead of accumulating on disk
      System.gc(); Thread.sleep(2000)
    }
    spark.stop()
  }
}
