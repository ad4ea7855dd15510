package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016) —
  * the tokenizer-training step of an LLM data pipeline, run where the data
  * already is instead of exporting the corpus to a single-node trainer.
  *
  * Shape at scale: ONE corpus pass builds the (word, count) frequency
  * table — the only job whose cost grows with corpus size; BPE statistics
  * are a function of that table alone, and its row count is the corpus
  * VOCABULARY (bounded, near-constant once the corpus is large), so every
  * merge round runs on a tiny distributed table: pair-count aggregation
  * (partial combine), a 1-row top-pair collect (the model parameter being
  * learned — inherently driver-side), and a scan-speed greedy re-merge of
  * the segmentations. Lineage is truncated per round (localCheckpoint,
  * same discipline as [[Dedup.connectedComponents]]) so plans stay O(1).
  */
object Bpe {

  /** End-of-word sentinel symbol (kept distinct from any character). */
  val EndOfWord = "</w>"

  /** Learn `numMerges` merges from the corpus. Deterministic: ties on the
    * pair count break lexicographically on (left, right), so the merge
    * table reproduces run-over-run and partition-over-partition.
    *
    * @param minCount stop early when the best pair occurs fewer times
    * @return merges in rank order, e.g. `("e","s") :: ("es","t") :: …` */
  def trainMerges(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    // the one corpus-sized job: normalized word frequencies
    val words = docs
      .select(explode(split(TextOps.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // initial segmentation: characters + the end-of-word sentinel
    var dict = words
      .select(concat(split(col("w"), ""), array(lit(EndOfWord))).as("syms"),
        col("cnt"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val best = dict
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        dict = dict
          .withColumn("syms", mergeOnce(col("syms"), l, r))
          .localCheckpoint(false)
        round += 1
      }
    }
    merges.toSeq
  }

  /** One greedy left-to-right merge pass of (l, r) → l+r over a symbol
    * array — the same scan order the reference BPE algorithm uses, as a
    * fold: append each symbol, collapsing it into the accumulator's tail
    * when (tail, symbol) == (l, r). `get` (not `element_at`) keeps the
    * empty-accumulator probe NULL-safe under ANSI mode. */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Segment one word (no whitespace) with a learned merge table: char
    * split + sentinel, then the merges replayed in rank order. The merge
    * loop unrolls at plan-build time — fine for the tens-of-merges tests
    * run in-engine; export the merge table to a real tokenizer for
    * 50k-vocab production use. */
  def segmentCol(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(concat(split(word, ""), array(lit(EndOfWord)))) {
      case (syms, (l, r)) => mergeOnce(syms, l, r)
    }

  /** Tokenize a corpus with a learned merge table: adds `outCol` =
    * flattened BPE pieces of the normalized text. Scan-speed (per-row
    * expressions only), one scan, no shuffle. */
  def tokenize(
      docs: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      outCol: String = "bpe_pieces"): DataFrame =
    docs.withColumn(outCol,
      flatten(transform(
        filter(split(TextOps.normalize(col(textCol)), " "), w => w =!= ""),
        w => segmentCol(w, merges))))

  /** The learned merge table as a DataFrame (rank, left, right) — the
    * exportable artifact, and the Verify surface for the trainer. */
  def mergesDf(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      minCount: Long = 2L): DataFrame = {
    val m = trainMerges(docs, numMerges, textCol, minCount)
    val spark = docs.sparkSession
    import spark.implicits._
    m.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "left", "right")
  }
}
