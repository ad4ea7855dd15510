package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: quiet-box adjudication harness for the end-to-end `curate`
  * smoke — the stage with the worst small-endpoint swing in the r12/r13
  * artifacts (12.8 s → 220 s on identical code and scale across box
  * draws). Interleaves 1M/10M passes in ONE JVM with the same
  * between-pass hygiene the bench applies (unpersist every registered
  * RDD, then driver GC — jstat during a r13 blow-up read old gen at
  * 99.92% with the concurrent collector cycling, i.e. heap state, not
  * the plan), so a plan regression separates from heap/box noise: a
  * regression moves EVERY pass at one scale, contention moves scattered
  * passes, and heap rot would move later passes only. Pass
  * `rows [passes]` to change scale (default 20M-label rows → 1M/10M
  * endpoints, 3 passes each). */
object CurateTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def synthDocs(m: Long) = {
      val seed = col("id") % lit(math.max(1L, m * 9 / 10))
      spark.range(m).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"),
        lit("synthetic").as("source"))
    }
    def curate(m: Long): Unit =
      operators.Curation.curate(synthDocs(m), langs = Seq("und", "en"),
          minQuality = 0.0, minTokens = 1, ccLocalThreshold = 0L)
        .write.format("noop").mode("overwrite").save()
    def hygiene(): Unit = {
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      System.gc(); Thread.sleep(2000)
    }
    curate(n / 20); hygiene() // warm-up (JIT + codegen + page cache)
    // pass-major interleave: every (scale, pass) cell measured against
    // the same accumulated-JVM background as its siblings
    for (pass <- 1 to passes; m <- Seq(n / 20, n / 2)) {
      val t0 = System.nanoTime()
      curate(m)
      println(f"curate $m%9d pass $pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      hygiene()
    }
    spark.stop()
  }
}
