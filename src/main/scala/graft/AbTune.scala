package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 in-JVM A/B harness for the optimization candidates whose
  * deltas are too small to trust across separate JVM runs on this box
  * (the degraded-memory host drifts 2x within minutes — see
  * OPTIMIZATION_r14.md "Measurement methodology"). Each candidate's OLD
  * implementation is inlined here verbatim (it no longer exists in the
  * operator after the rewrite) and timed ALTERNATELY with the NEW one in
  * the same session: warm-up draw per side, then interleaved
  * B,A,B,A,B,A; min-of-3 per side, printed as one JSON line. Alternation
  * means box drift inside the run degrades both sides equally instead of
  * biasing whichever ran later.
  *
  * Usage: SPARK_DRIVER_MEM=10g sbt "runMain graft.AbTune /root/testdata/sf0.1"
  */
object AbTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-abtune")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables.load(spark, sfDir)

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both sides, then interleave: B A B A B A → min per side
    def ab(name: String, oldDf: => DataFrame, newDf: => DataFrame): Unit = {
      once(oldDf); once(newDf)
      val draws = (1 to 3).flatMap { _ => Seq("new" -> once(newDf), "old" -> once(oldDf)) }
      val n = draws.collect { case ("new", s) => s }.min
      val o = draws.collect { case ("old", s) => s }.min
      println(f"""ABTUNE {"case":"$name","old_min":$o%.4f,"new_min":$n%.4f,"draws":${draws.map(d => f"${d._2}%.3f").mkString("[", ",", "]")}}""")
    }

    // ---- exact percentile aggregation: builtin vs ExactQuantiles ------
    val li = t("lineitem")
    val fracs = (1 until 10).map(_.toDouble / 10)
    val arr = array(fracs.map(lit): _*)
    val cols3 = Seq("l_quantity", "l_extendedprice", "l_discount")
    def oldQ: DataFrame = li.agg(
      percentile(col(cols3(0)).cast("double"), arr).as("__q0"),
      percentile(col(cols3(1)).cast("double"), arr).as("__q1"),
      percentile(col(cols3(2)).cast("double"), arr).as("__q2"))
    def newQ: DataFrame = {
      val agg = udaf(new operators.Profile.ExactQuantiles(fracs.toArray))
      li.agg(agg(col(cols3(0)).cast("double")).as("__q0"),
        agg(col(cols3(1)).cast("double")).as("__q1"),
        agg(col(cols3(2)).cast("double")).as("__q2"))
    }
    ab("exact_percentile_3col_9frac", oldQ, newQ)

    // ---- bm25: post-agg qterm join (old, inlined) vs pre-agg filter ---
    val docs = t("documents")
    val queries = docs
      .join(t("embeddings"), col("doc_id") === col("vec_id"))
      .filter(col("doc_id") < 5)
      .select((col("doc_id") + 10000L).as("query_id"),
        col("text").as("qtext"))
    def oldBm25: DataFrame = {
      import operators.TextOps.normalize
      val w = split(normalize(col("text")), " ")
      val base = docs.select(col("doc_id").as("__id"),
        when(length(normalize(col("text"))) === 0, lit(0))
          .otherwise(size(w)).as("__dl"),
        w.as("__w"))
      val corpus = base.agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__dl")).as("__avgdl"))
      val postings = base
        .select(col("__id"), col("__dl"), explode(col("__w")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("__id"), col("__dl"), col("token"))
        .agg(count(lit(1)).as("__tf"))
      val qterms = queries.select(col("query_id").as("__qid"),
          explode(split(normalize(col("qtext")), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .distinct()
      val dfq = postings
        .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("__df"))
      val k1 = 1.2; val b = 0.75
      val tfNorm = col("__tf") * (k1 + 1) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
      val idf = log(lit(1.0) +
        (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
      val ranked = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__qid"))
        .orderBy(col("score").desc, col("__id"))
      postings
        .join(broadcast(qterms), Seq("token"))
        .join(broadcast(dfq), Seq("token"))
        .crossJoin(broadcast(corpus))
        .groupBy(col("__qid"), col("__id"))
        .agg(round(sum(idf * tfNorm), 6).as("score"))
        .withColumn("rank", row_number().over(ranked))
        .filter(col("rank") <= 10)
        .select(col("__qid").as("query_id"), col("__id").as("doc_id"),
          col("score"), col("rank"))
    }
    def newBm25: DataFrame =
      operators.TextOps.bm25(docs, queries, topK = 10)
    ab("bm25_prefilter_postings", oldBm25, newBm25)

    spark.stop()
  }
}
