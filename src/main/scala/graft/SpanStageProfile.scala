package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main (r15): stage-wise decomposition of the dup-span WINDOW shape
  * on the synthetic smoke corpus — where do the seconds go?
  *
  *   sbt "runMain graft.SpanStageProfile 2000000"
  */
object SpanStageProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
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
    val docs = synthDocs(n)
    val parts = operators.TextOps.fanoutParts(docs, "text")
    println(s"n=$n fanoutParts=$parts")
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // min of 2 (one-sided noise), after shared warm-up below
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${secs.min}%7.1f s   (draws ${secs.map(s => f"$s%.1f").mkString(", ")})")
      System.gc(); Thread.sleep(500)
    }

    val occ = docs.select(col("doc_id").as("__id"),
        posexplode(graft.functions.TextKernels.spanHashesCol(
          operators.TextOps.normalize(col("text")), 8)).as(Seq("__p", "__h")))
    val sized = occ.repartition(parts, col("__h"))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    val windowed = sized
      .withColumn("__occ", count(lit(1)).over(byHash))
      .withColumn("__first", min(struct(col("__id"), col("__p"))).over(byHash))
    val removals = windowed
      .filter(col("__occ") > 1 &&
        !(col("__first")("__id") === col("__id") &&
          col("__first")("__p") === col("__p")))
      .groupBy(col("__id"))
      .agg(collect_list(col("__p")).as("__starts"))
      .withColumnRenamed("__id", "doc_id")

    // warm-up (JIT/codegen) on n/10
    operators.TextOps.removeDupSpans(synthDocs(n / 10), n = 8)
      .write.format("noop").mode("overwrite").save()
    System.gc(); Thread.sleep(500)

    t("synth scan")(docs)
    t("occ kernel (explode+md5)")(occ)
    t("+ exchange (repartition)")(sized)
    t("+ window (sort+count+min)")(windowed)
    t("+ filter+rollup (removals)")(removals)
    t("full removeDupSpans")(
      operators.TextOps.removeDupSpansWindow(docs, 8, "text", "doc_id", parts))
    // rebuild join as shuffled-hash instead of sort-merge: does skipping
    // the payload sort pay?
    val words = split(operators.TextOps.normalize(col("text")), " ")
    val starts = coalesce(col("__starts"), array().cast("array<int>"))
    val kept = filter(words, (_, i) =>
      !exists(starts, s => s <= i && i < s + 8))
    t("full, SHJ rebuild join")(
      docs.join(removals.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), concat_ws(" ", kept).as("clean_text"),
          size(words).cast("long").as("n_words"),
          (size(words) - size(kept)).cast("long").as("n_removed")))
    spark.stop()
  }
}
