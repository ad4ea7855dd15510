package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main (r15): A/B the corpus-global dup-span WINDOW shape against
  * the hash-aggregation shape (no sort, reused exchange, shuffled-hash
  * election join) on the bench's synthetic smoke corpus.
  *
  *   sbt "runMain graft.SpanShapeTune 20000000 [detect|remove|both]"
  *
  * Prints per-shape wall time (interleaved passes so box noise cannot
  * pick the winner) plus plan diagnostics: Exchange / Sort /
  * ReusedExchange / ShuffledHashJoin node counts for the agg shape.
  */
object SpanShapeTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val mode = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def synthDocs(m: Long) = {
      val seed = col("id") % lit(math.max(1L, m * 9 / 10))
      spark.range(m).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"))
    }

    def planStats(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).size
      println(s"$label plan: exchanges=${c("Exchange hashpartitioning")} " +
        s"sorts=${c("\\bSort\\b")} reused=${c("ReusedExchange")} " +
        s"shj=${c("ShuffledHashJoin")} smj=${c("SortMergeJoin")} " +
        s"window=${c("\\bWindow\\b")}")
    }

    val docs = synthDocs(n)
    val parts = operators.TextOps.fanoutParts(docs, "text")
    println(s"n=$n fanoutParts=$parts")

    type Mk = () => org.apache.spark.sql.DataFrame
    val shapes = scala.collection.mutable.LinkedHashMap[String, Mk]()
    if (mode == "detect" || mode == "both") {
      shapes("detect_window") =
        () => operators.TextOps.dupSpansWindow(docs, 8, "text", "doc_id", parts)
      shapes("detect_agg") =
        () => operators.TextOps.dupSpansAgg(docs, 8, "text", "doc_id", parts)
    }
    if (mode == "remove" || mode == "both") {
      shapes("remove_window") =
        () => operators.TextOps.removeDupSpansWindow(docs, 8, "text", "doc_id", parts)
      shapes("remove_agg") =
        () => operators.TextOps.removeDupSpansAgg(docs, 8, "text", "doc_id", parts)
    }

    // plan diagnostics once (pre-run initial plans)
    shapes.foreach { case (name, mk) => planStats(mk(), name) }

    // warm-up at n/10 (JIT/codegen), untimed
    locally {
      val small = synthDocs(n / 10)
      val p10 = operators.TextOps.fanoutParts(small, "text")
      if (mode != "remove") {
        operators.TextOps.dupSpansWindow(small, 8, "text", "doc_id", p10)
          .write.format("noop").mode("overwrite").save()
        operators.TextOps.dupSpansAgg(small, 8, "text", "doc_id", p10)
          .write.format("noop").mode("overwrite").save()
      }
      if (mode != "detect") {
        operators.TextOps.removeDupSpansWindow(small, 8, "text", "doc_id", p10)
          .write.format("noop").mode("overwrite").save()
        operators.TextOps.removeDupSpansAgg(small, 8, "text", "doc_id", p10)
          .write.format("noop").mode("overwrite").save()
      }
    }
    System.gc(); Thread.sleep(1000)

    for (pass <- 1 to 2; (name, mk) <- shapes) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name%-16s n=$n%9d pass $pass: ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      System.gc(); Thread.sleep(1000)
    }
    spark.stop()
  }
}
