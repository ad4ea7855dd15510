package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: isolates the per-row costs inside TextOps.analyze on the
  * bench's synthetic corpus shape — textStats kernel vs fingerprint
  * (lower + regexp_replace + trim + xxhash64) vs the full analyze
  * projection. Two rounds; read round 2 (JIT-warm). */
object TextStatsTune {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-textstats-tune")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val seed = col("id") % lit(math.max(1L, n * 9 / 10))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)),
        i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"),
      lit("synthetic").as("source"))
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("synth-only") { noop(docs.select(col("text"))) }
      t("textStats") { noop(docs.select(
        graft.functions.TextKernels.textStatsCol(col("text")).as("st"))) }
      t("fingerprint") { noop(docs.select(
        operators.TextOps.fingerprint(col("text")).as("fp"))) }
      t("analyze-full") { noop(operators.TextOps.analyze(docs)) }
    }
    spark.stop()
  }
}
