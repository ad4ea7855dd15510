package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: recall@10 grid for the ANN operators vs brute-force topK on
  * the embeddings fixture — the measurement behind the tuned defaults in
  * [[graft.operators.Similarity]] and the recall floors in OperatorsSpec.
  *
  *   sbt "runMain graft.AnnTune /root/testdata/sf0.1"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-ann-tune")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Similarity

    val emb = Tables.load(spark, dir)("embeddings").cache()
    val n = emb.count()
    val nq = 50
    val queries = emb.filter(col("vec_id") < nq).withColumnRenamed("vec_id", "query_id")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.topK(emb, queries, k = 10))
    println(s"corpus=$n queries=$nq exact=${exact.size}")

    println("== topKBucketed (planesN, chunks) -> recall, candFrac ==")
    for ((p, c) <- Seq((12, 4), (12, 6), (16, 4), (16, 8), (20, 5), (24, 8), (24, 12))) {
      val approx = pairs(Similarity.topKBucketed(emb, queries, k = 10,
        planesN = p, chunks = c, dims = 64))
      // candidate fraction: probability a random pair shares >=1 chunk value
      val bits = p / c
      val frac = 1.0 - math.pow(1.0 - math.pow(0.5, bits), c)
      println(f"planes=$p%2d chunks=$c%2d recall=${(exact & approx).size.toDouble / exact.size}%.3f candFracRnd=$frac%.3f")
    }

    println("== topKIvf (nlist, nprobe, kmeansIter) -> recall, scanFrac ==")
    for ((nl, np, km) <- Seq(
        (16, 4, 0), (16, 4, 2), (16, 4, 4), (16, 6, 2), (16, 8, 2),
        (16, 10, 2), (16, 10, 4), (16, 12, 2), (32, 16, 2))) {
      val approx = pairs(Similarity.topKIvf(emb, queries, k = 10,
        nlist = nl, nprobe = np, dims = 64, kmeansIter = km))
      println(f"nlist=$nl%2d nprobe=$np%2d km=$km recall=${(exact & approx).size.toDouble / exact.size}%.3f scanFrac~${np.toDouble / nl}%.3f")
    }
    println("== topKPq (m, ksub, iters, rerank) -> recall ==")
    for ((m, ks, it, rr) <- Seq(
        (8, 16, 2, 4), (8, 16, 2, 10), (8, 16, 2, 20), (8, 64, 2, 10),
        (8, 256, 2, 4), (8, 256, 2, 10), (16, 16, 2, 4), (16, 16, 2, 10),
        (16, 256, 2, 4), (8, 256, 0, 10), (8, 256, 4, 10), (16, 64, 2, 10))) {
      val approx = pairs(Similarity.topKPq(emb, queries, k = 10,
        m = m, ksub = ks, iters = it, rerank = rr, dims = 64))
      println(f"m=$m%2d ksub=$ks%3d iters=$it rerank=$rr%2d recall=${(exact & approx).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
