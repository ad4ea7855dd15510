package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: per-stage timing of the exact q_curate path on a fixture dir
  * (the synthetic-corpus complement is [[PipeProfile]]) — localizes bench
  * movement to filters / pair generation / CC / anti-join.
  *
  *   sbt "runMain graft.CurateProfile /root/testdata/sf0.1"
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-curate-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.load(spark, dir)("documents")
    locally {
      val plan = operators.TextOps.analyze(docs)
        .filter(col("lang_pred").isin("en") &&
          col("quality") >= 0.7 && col("token_count").between(5, 100000))
        .queryExecution.executedPlan.toString
      val k = "textStats".r.findAllIn(plan).size
      println(s"kernel occurrences in filtered plan: $k")
      val planNoF = operators.TextOps.analyze(docs).queryExecution.executedPlan.toString
      println(s"kernel occurrences in project-only plan: " +
        "textStats".r.findAllIn(planNoF).size)
    }
    // two rounds: round 1 absorbs JIT/codegen warm-up, round 2 localizes
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("scan+count") { docs.write.format("noop").mode("overwrite").save() }
      t("analyze pruned-select") {
        operators.TextOps.analyze(docs)
          .select("doc_id", "lang_pred", "quality", "token_count")
          .write.format("noop").mode("overwrite").save()
      }
      t("analyze all-cols") {
        operators.TextOps.analyze(docs)
          .write.format("noop").mode("overwrite").save()
      }
      t("analyze+filter no-persist") {
        operators.TextOps.analyze(docs)
          .filter(col("lang_pred").isin("en") &&
            col("quality") >= 0.7 && col("token_count").between(5, 100000))
          .write.format("noop").mode("overwrite").save()
      }
      val filtered = operators.TextOps.analyze(docs)
        .filter(col("lang_pred").isin("en") &&
          col("quality") >= 0.7 && col("token_count").between(5, 100000))
        .persist()
      t("analyze+filter+persist") { filtered.count() }
      var pairs: DataFrame = null
      t("minHashPairs(materialize)") { pairs = operators.Dedup.minHashPairs(filtered) }
      println(s"pairs=${pairs.count()}")
      t("keepCanonical+materialize") {
        operators.Dedup.keepCanonical(filtered, pairs)
          .write.format("noop").mode("overwrite").save()
      }
      pairs.unpersist(); filtered.unpersist()
      t("curate() end-to-end") {
        operators.Curation.curate(docs)
          .select("doc_id").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
