package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: exercises the incremental BPE trainer on the bench's
  * synthetic corpus shape and prints per-stage timings — the local
  * iteration loop for the bpe_1k_merges_sec scale-smoke entry. */
object BpeTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val merges = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("BPE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seed = col("id") % lit(math.max(1L, n * 9 / 10))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"),
      lit("synthetic").as("source"))
    val t0 = System.nanoTime()
    val m = operators.Bpe.trainMerges(docs, numMerges = merges,
      localThreshold = sys.env.getOrElse("BPE_LOCAL_THRESHOLD", "2000000").toLong)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"learned ${m.size} merges in $sec%.1f s (${sec / m.size}%.3f s/merge)")
    println(m.take(10).mkString(", "))
    // deployment half: apply the learned table corpus-wide at scan speed
    val t1 = System.nanoTime()
    val pieces = operators.Bpe.tokenize(docs, m)
      .select(sum(size(col("bpe_pieces")))).head().getLong(0)
    val tsec = (System.nanoTime() - t1) / 1e9
    println(f"tokenized $n docs -> $pieces pieces in $tsec%.1f s " +
      f"(${n / tsec / 1e6}%.2f M docs/s)")
    spark.stop()
  }
}
