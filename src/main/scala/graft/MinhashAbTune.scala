package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: interleaved A/B of the minHashPairs verify-join shapes on
  * the synthetic smoke corpus — (a) the pre-r15 shape (one lazy plan,
  * sort-merge attach joins, no prefilter), (b) shuffled-hash attach only,
  * (c) the shipped minHashPairs. Interleaved passes cancel box
  * drift; each variant reports its full pair-generation wall time.
  *
  *   sbt "runMain graft.MinhashAbTune 10000000 3"
  */
object MinhashAbTune {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-minhash-ab")
      .config("spark.sql.shuffle.partitions", "32")
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
    val docs = synthDocs(n)

    // variant (a): the pre-r15 lazy single-plan SMJ shape, mirrored
    def oldShape(): Long = {
      val withSh = docs
        .select(col("doc_id").as("id"), TextOps.shingles(col("text"), 3).as("sh"))
        .persist()
      val banded = withSh.select(col("id"),
        posexplode(graft.functions.TextKernels.minhashBucketsCol(col("sh"), 16, 4)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = Dedup.bucketPairs(banded, Seq("band", "bucket"), "id",
        100000, fanoutRows = n * 16)
      val out = cand
        .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
        .filter(col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "jaccard")
      val m = out.persist(); val c = m.count()
      withSh.unpersist(false); m.unpersist(false); c
    }
    // variant (b): as (a) but shuffled-hash attach joins
    def shjShape(): Long = {
      val withSh = docs
        .select(col("doc_id").as("id"), TextOps.shingles(col("text"), 3).as("sh"))
        .persist()
      val banded = withSh.select(col("id"),
        posexplode(graft.functions.TextKernels.minhashBucketsCol(col("sh"), 16, 4)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = Dedup.bucketPairs(banded, Seq("band", "bucket"), "id",
        100000, fanoutRows = n * 16)
      val out = cand.hint("shuffle_hash")
        .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .hint("shuffle_hash")
        .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
        .filter(col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "jaccard")
      val m = out.persist(); val c = m.count()
      withSh.unpersist(false); m.unpersist(false); c
    }
    // variant (c): the shipped minHashPairs
    def newShape(): Long = {
      val out = Dedup.minHashPairs(docs)
      val c = out.count(); out.unpersist(); c
    }

    for (p <- 1 to passes) {
      for ((name, f) <- Seq("old-smj" -> (() => oldShape()),
          "shj-only" -> (() => shjShape()),
          "shipped" -> (() => newShape()))) {
        val t0 = System.nanoTime()
        val c = f()
        println(f"pass $p $name%-10s ${(System.nanoTime() - t0) / 1e9}%7.1f s  pairs=$c")
      }
    }
    spark.stop()
  }
}
