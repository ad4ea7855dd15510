package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: per-stage timing of the curation pipeline on the synthetic
  * smoke corpus — where do the seconds go at N docs?
  *
  *   sbt "runMain graft.operators.PipeProfile 2000000"
  */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val parts = args.drop(1).headOption.getOrElse("32")
    val fallback = args.drop(2).headOption.getOrElse("128")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-pipe-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", fallback)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def synthDocs(rows: Long): DataFrame = {
      val seed = col("id") % lit(math.max(1L, rows * 9 / 10))
      spark.range(rows).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          i => concat(lit("w"), pmod(hash(seed, i), lit(5000))))).as("text"),
        lit("synthetic").as("source"))
    }
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = synthDocs(n)
    t("synth+count") { docs.write.format("noop").mode("overwrite").save() }
    val filtered = TextOps.analyze(docs)
      .filter(col("lang_pred").isin("und", "en") &&
        col("quality") >= 0.0 && col("token_count").between(1, 100000))
      .persist()
    t("analyze+filter+persist") { filtered.count() }
    // sub-stage breakdown of the minHashPairs plan (mirrors Dedup internals)
    locally {
      val withSh = filtered
        .select(col("doc_id").as("id"),
          TextOps.shingles(col("text"), 3).as("sh"))
        .persist()
      t("  mh: shingle+persist") { withSh.count() }
      val banded = withSh.select(col("id"),
        posexplode(graft.functions.TextKernels.minhashBucketsCol(col("sh"), 16, 4)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      t("  mh: band kernel") { banded.write.format("noop").mode("overwrite").save() }
      val cand = Dedup.bucketPairs(banded, Seq("band", "bucket"), "id", 100000)
      t("  mh: bucket pairs") { cand.write.format("noop").mode("overwrite").save() }
      val out = cand
        .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
        .filter(col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "jaccard")
      t("  mh: verify join") { out.write.format("noop").mode("overwrite").save() }
      // r15 A/B: shuffled-hash attach (build = the small candidate side)
      // — the SMJ default sorts the heavy shingle table by id twice
      val outShj = cand.hint("shuffle_hash")
        .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .hint("shuffle_hash")
        .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
        .filter(col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "jaccard")
      t("  mh: verify join SHJ") { outShj.write.format("noop").mode("overwrite").save() }
      withSh.unpersist()
    }
    var pairs: DataFrame = null
    t("minHashPairs") { pairs = Dedup.minHashPairs(filtered) }
    println(s"pairs=${pairs.count()}")
    var cc: DataFrame = null
    t("cc distributed") {
      cc = Dedup.connectedComponents(pairs, localThreshold = 0L)
      cc.write.format("noop").mode("overwrite").save()
    }
    t("keepCanonical+materialize") {
      Dedup.keepCanonical(filtered, pairs, localThreshold = 0L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
