package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: stage-wise timing of the distributed connected-components
  * RDD loop on the chain-graph smoke shape — setup (DF→RDD conversion,
  * edge doubling, partitionBy, initial labels) vs per-round cost.
  * Mirrors [[operators.Dedup]] internals for measurement only.
  *
  *   sbt "runMain graft.CcProfile 20000000"
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def chainEdges(m: Long) = spark.range(m)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))

    for (round <- 1 to 2) {
      println(s"--- pass $round")
      val e0 = chainEdges(n).select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .persist()
      t("e0 persist+count") { e0.count() }
      t("null check") { e0.filter(col("src").isNull || col("dst").isNull).isEmpty }
      val nEdges = n * 4 / 5
      val session = spark.sessionState.conf.numShufflePartitions
      val nParts = math.max(session.toLong,
        math.min(4096L, (2 * nEdges) / 2000000L)).toInt
      println(s"nParts=$nParts")
      val part = new org.apache.spark.HashPartitioner(nParts)
      val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val edges = e0.rdd
        .flatMap { r =>
          val a = r.getLong(0); val b = r.getLong(1)
          Iterator((a, b), (b, a))
        }
        .partitionBy(part)
        .persist(level)
      t("edges double+partition") { edges.count() }
      var labels = edges
        .mapPartitions(it => {
          val seen = new java.util.HashSet[java.lang.Long]()
          it.flatMap { case (k, _) =>
            if (seen.add(k)) Iterator((k, k)) else Iterator.empty
          }
        }, preservesPartitioning = true)
        .persist(level)
      t("labels init") { labels.count() }
      var persisted: org.apache.spark.rdd.RDD[_] = labels
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        t(s"round $iter") {
          val propMin = edges.join(labels, part)
            .map { case (_, (dst, comp)) => (dst, comp) }
            .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
          val next = labels
            .leftOuterJoin(propMin, part)
            .mapValues { case (old, pm) =>
              val m = pm.fold(old)(math.min(old, _)); (m, m < old)
            }
            .persist(level)
          converged = next.filter(_._2._2).count() == 0
          persisted.unpersist(false)
          persisted = next
          labels = next.mapValues(_._1)
        }
        iter += 1
      }
      edges.unpersist(false)
      persisted.unpersist(false)
      e0.unpersist(false)
      // the shipped loop (delta propagation), same pass for an
      // interleaved A/B against the send-everything mirror above
      val t0 = System.nanoTime()
      operators.Dedup.connectedComponents(chainEdges(n), localThreshold = 0L)
        .write.format("noop").mode("overwrite").save()
      println(f"shipped cc end-to-end    ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
