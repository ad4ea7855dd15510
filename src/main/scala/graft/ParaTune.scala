package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: A/B the paragraph-dedup scan variants on the sf0.1
  * documents table. bench_full_r11 read q_dedup_paragraphs at 6.70 s vs
  * r10's 2.26 s, and the only code change was `coalesce(text, '')`
  * before the census split (the r11 null-preservation fix). This
  * interleaves three variants within one JVM so box contention cannot
  * pick the winner:
  *   current — census on the RAW column, rebuild coalesced (r12)
  *   r11     — both scans coalesced (the regressed reading's code)
  *   r10     — both scans raw (drops null-text docs; timing-only ref)
  */
object ParaTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the exact q_dedup_paragraphs input: overlapping 3-paragraph synth
    // docs from document triples (every interior paragraph occurs 3x)
    val d = Tables.load(spark, sfDir)("documents")
      .select(col("doc_id"), col("text"))
    val b = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("bt"))
    val c = d.select((col("doc_id") - 2).as("doc_id"), col("text").as("ct"))
    val docs = d.join(b, "doc_id").join(c, "doc_id")
      .select(col("doc_id"),
        concat_ws("\n\n", col("text"), col("bt"), col("ct")).as("text"))

    def variant(docsDf: DataFrame, censusCoalesce: Boolean,
        rebuildCoalesce: Boolean): DataFrame = {
      val minChars = 10
      def src(c: Boolean) =
        if (c) coalesce(col("text"), lit("")) else col("text")
      val keyed = docsDf.select(col("doc_id").as("__id"),
          posexplode(split(src(censusCoalesce), "\n\n")).as(Seq("__i", "__para")))
        .filter(length(trim(col("__para"))) >= minChars)
        .select(col("__id"), col("__i"),
          operators.TextOps.portableHash60(
            operators.TextOps.normalize(col("__para"))).as("__h"))
      val paras = docsDf.select(col("doc_id").as("__id"),
        posexplode(split(src(rebuildCoalesce), "\n\n")).as(Seq("__i", "__para")))
      val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
      val removals = keyed
        .withColumn("__occ", count(lit(1)).over(byHash))
        .withColumn("__first", min(struct(col("__id"), col("__i"))).over(byHash))
        .filter(col("__occ") > 1 &&
          !(col("__first")("__id") === col("__id") &&
            col("__first")("__i") === col("__i")))
        .select(col("__id"), col("__i"), lit(true).as("__rm"))
      paras.join(removals, Seq("__id", "__i"), "left")
        .groupBy(col("__id"))
        .agg(
          array_join(transform(array_sort(collect_list(
              when(col("__rm").isNull, struct(col("__i"), col("__para"))))),
            x => x.getField("__para")), "\n\n").as("clean_text"),
          count(lit(1)).as("n_paras"),
          count(col("__rm")).as("n_removed"))
    }

    println("volumeParts(synth, 8MB) = " +
      operators.TextOps.volumeParts(docs, targetBytes = 8L << 20))
    println("plan sizeInBytes = " +
      docs.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("volumeParts(documents, 8MB) = " +
      operators.TextOps.volumeParts(d, targetBytes = 8L << 20))

    def run(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm-up (JIT, page cache)
    variant(docs, censusCoalesce = false, rebuildCoalesce = true)
      .write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      run("operator(current)") {
        operators.Dedup.dropDupParagraphs(docs, minChars = 10) }
      run("census_raw(r12)") {
        variant(docs, censusCoalesce = false, rebuildCoalesce = true) }
      run("both_coalesced(r11)") {
        variant(docs, censusCoalesce = true, rebuildCoalesce = true) }
      run("both_raw(r10)") {
        variant(docs, censusCoalesce = false, rebuildCoalesce = false) }
      System.gc(); Thread.sleep(500)
    }
    spark.stop()
  }
}
