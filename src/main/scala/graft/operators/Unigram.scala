package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training and deployment (the SentencePiece
  * family, Kudo 2018) — the second tokenizer the pipeline needs next to
  * [[Bpe]]: unigram models segment by GLOBAL likelihood instead of greedy
  * merges, which is what multilingual production tokenizers ship.
  *
  * This is the deterministic hard-EM (Viterbi-EM) variant: the E-step
  * re-segments under the current piece log-probs and counts the chosen
  * pieces; the M-step renormalizes with add-1 smoothing and anneals the
  * vocabulary linearly from the seed size down to `vocabSize`
  * (single-character pieces are never pruned, so coverage is total and
  * no `<unk>` is reachable for characters seen anywhere in training —
  * unseen characters at ENCODE time take a fixed `UnkLogp` single-char
  * fallback).
  *
  * Shape at scale (same adjudication as [[Bpe.trainMerges]] and the
  * k-means/PQ codebooks): ONE corpus pass builds the (word, count)
  * dictionary — the only data-sized job; seeding and every EM round run
  * over that model-sized dict (bounded substring fan-out, bounded piece
  * census), and only piece censuses (≤ seed-size rows) ever reach the
  * driver. Encoding is one scan-speed kernel pass
  * ([[graft.functions.TextKernels.unigramSegmentCol]]) with the model as
  * plan literals — no shuffle, no join, no UDF.
  */
object Unigram {

  /** Log-prob of an unknown single-character fallback at encode time —
    * far below any trained piece so it is only taken when nothing in the
    * model covers the character. */
  val UnkLogp: Double = -30.0

  /** A trained model: pieces with natural-log probabilities, ordered
    * (logp desc, piece asc) — deterministic, export-ready. */
  final case class Model(pieces: Seq[String], logps: Seq[Double]) {
    require(pieces.length == logps.length, "pieces/logps must align")
  }

  /** All char-substring windows of a word up to `maxPieceLen`, as a
    * Column (bounded fan-out: ≤ len·maxPieceLen per word). */
  private def substrWindows(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - i + 1)),
        l => w.substr(i, l))))

  private def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(TextOps.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Train a unigram model. `emIters` Viterbi-EM rounds over the word
    * dictionary; vocabulary anneals linearly seed → `vocabSize`.
    * Deterministic: every census orders (count desc, piece asc), all
    * smoothing is closed-form. */
  def train(
      docs: DataFrame,
      vocabSize: Int,
      textCol: String = "text",
      maxPieceLen: Int = 8,
      seedMultiplier: Int = 4,
      emIters: Int = 4): Model = {
    require(vocabSize >= 2, "vocabSize must be >= 2")
    require(maxPieceLen >= 1 && seedMultiplier >= 1 && emIters >= 0,
      "bad maxPieceLen/seedMultiplier/emIters")
    val words = wordDict(docs, textCol).persist()
    try {
      val seedSize = vocabSize * seedMultiplier
      // seed census: substring occurrences weighted by word frequency
      val seed = words
        .select(explode(substrWindows(col("w"), maxPieceLen)).as("p"),
          col("cnt"))
        .groupBy("p").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("p"))
        .limit(seedSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      // single characters are the coverage floor: never pruned
      require(seed.nonEmpty,
        "unigram training needs a non-empty corpus (no words found)")
      val chars = words
        .select(explode(split(col("w"), "")).as("p"))
        .filter(col("p") =!= "").distinct()
        .collect().map(_.getString(0)).toSet
      def toModel(counts: Seq[(String, Long)]): Model = {
        val total = counts.map(_._2).sum.toDouble
        val v = counts.size
        val scored = counts
          .map { case (p, n) => (p, math.log((n + 1.0) / (total + v))) }
          .sortBy { case (p, lp) => (-lp, p) }
        Model(scored.map(_._1), scored.map(_._2))
      }
      def prune(counts: Seq[(String, Long)], keep: Int): Seq[(String, Long)] = {
        val byCount = counts.sortBy { case (p, n) => (-n, p) }
        val kept = scala.collection.mutable.LinkedHashSet[String]()
        byCount.iterator.takeWhile(_ => kept.size < keep)
          .foreach(pn => kept += pn._1)
        val cm = counts.toMap
        (kept ++ chars).toSeq.map(p => (p, cm.getOrElse(p, 0L)))
      }
      var counts: Seq[(String, Long)] =
        prune(seed.toSeq, math.max(vocabSize, seedSize))
      var model = toModel(counts)
      var round = 1
      while (round <= emIters) {
        // E-step: Viterbi-segment the dict under the current model,
        // count chosen pieces weighted by word frequency
        val census = words
          .select(explode(segment(col("w"), model)).as("p"), col("cnt"))
          .groupBy("p").agg(sum("cnt").as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
        // M-step with linear vocabulary annealing toward vocabSize
        val keep = math.max(vocabSize,
          ((seedSize.toLong * (emIters - round) +
            vocabSize.toLong * round) / emIters).toInt)
        counts = prune(census, keep)
        model = toModel(counts)
        round += 1
      }
      // the last EM round anneals to exactly vocabSize; this final prune
      // is a no-op there but enforces the contract for emIters = 0,
      // which previously returned the whole seed-sized vocabulary
      counts = prune(counts, vocabSize)
      toModel(counts)
    } finally words.unpersist()
  }

  /** Viterbi segmentation of normalized text under `model` — one kernel
    * expression, model as plan literals. */
  def segment(normText: Column, model: Model): Column =
    graft.functions.TextKernels.unigramSegmentCol(
      normText, model.pieces, model.logps, UnkLogp)

  /** Tokenize a corpus: adds `outCol` = flattened unigram pieces of the
    * normalized text. Scan-speed, one scan, zero shuffle. */
  def tokenize(
      docs: DataFrame,
      model: Model,
      textCol: String = "text",
      outCol: String = "unigram_pieces"): DataFrame =
    docs.withColumn(outCol,
      segment(TextOps.normalize(col(textCol)), model))

  /** Tokenize straight to integer ids: id = model position + 1, with 0
    * reserved for the unknown-character fallback pieces the encoder can
    * emit for characters unseen at training time (the same <unk>=0
    * convention as [[Bpe.tokenizeIds]]; [[vocabDf]] ids are these minus
    * 1). */
  def tokenizeIds(
      docs: DataFrame,
      model: Model,
      textCol: String = "text",
      outCol: String = "token_ids"): DataFrame = {
    val lookup = typedLit(
      model.pieces.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    val tmp = Iterator.iterate("__pieces")(_ + "_")
      .dropWhile(docs.columns.contains).next()
    tokenize(docs, model, textCol, tmp)
      .withColumn(outCol,
        transform(col(tmp), p => coalesce(element_at(lookup, p), lit(0))))
      .drop(tmp)
  }

  // ------------------------------------------------------ byte-level mode

  private def proxyTmp(docs: DataFrame): String =
    Iterator.iterate("__bytes")(_ + "_")
      .dropWhile(docs.columns.contains).next()

  /** [[train]] over the byte-proxy representation
    * ([[Bpe.byteProxyText]]): pieces are byte sequences as proxy
    * strings, the base alphabet is the 256 bytes, and `<unk>` fallback
    * is unreachable for ANY input — the GPT-2-style byte-level twin,
    * sharing the BPE byte machinery. */
  def trainBytes(
      docs: DataFrame,
      vocabSize: Int,
      textCol: String = "text",
      maxPieceLen: Int = 8,
      seedMultiplier: Int = 4,
      emIters: Int = 4): Model = {
    val tmp = proxyTmp(docs)
    train(docs.withColumn(tmp, Bpe.byteProxyText(col(textCol))),
      vocabSize, tmp, maxPieceLen, seedMultiplier, emIters)
  }

  /** [[tokenize]] over the byte-proxy representation (pieces are proxy
    * strings; decode back via
    * [[graft.functions.TextKernels.byteUnproxy]]). */
  def tokenizeBytes(
      docs: DataFrame,
      model: Model,
      textCol: String = "text",
      outCol: String = "unigram_pieces"): DataFrame = {
    val tmp = proxyTmp(docs)
    tokenize(docs.withColumn(tmp, Bpe.byteProxyText(col(textCol))),
      model, tmp, outCol).drop(tmp)
  }

  /** [[tokenizeIds]] over the byte-proxy representation — unk id 0 is
    * unreachable when the model was trained with [[trainBytes]] on any
    * corpus covering the byte alphabet (single bytes are never pruned).
    */
  def tokenizeIdsBytes(
      docs: DataFrame,
      model: Model,
      textCol: String = "text",
      outCol: String = "token_ids"): DataFrame = {
    val tmp = proxyTmp(docs)
    tokenizeIds(docs.withColumn(tmp, Bpe.byteProxyText(col(textCol))),
      model, tmp, outCol).drop(tmp)
  }

  /** The model as a DataFrame (id, piece, logp) — the exportable
    * artifact (ids are dense in (logp desc, piece asc) order). */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.indices
      .map(i => (i, model.pieces(i), model.logps(i)))
      .toDF("id", "piece", "logp")
  }

  /** Mean corpus negative log-likelihood per WORD under `model` — the
    * training-progress / tokenizer-health audit (lower = the model
    * explains the corpus better). The denominator is the corpus word
    * count, NOT the piece count: dividing by pieces would dilute a
    * high-fertility model's NLL by its own fertility and bias
    * cross-model comparisons. Two passes over the (persisted) dict. */
  def corpusNll(docs: DataFrame, model: Model,
      textCol: String = "text"): Double = {
    val dict = wordDict(docs, textCol).persist()
    try {
      val nWords = dict.agg(sum("cnt")).head().getLong(0)
      // bounded piece census collected to the driver, logp looked up in
      // an O(1) hash map there — a per-row array_position lookup would
      // scan the whole vocabulary literal per exploded piece
      val census = dict
        .select(explode(segment(col("w"), model)).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("n"))
        .collect()
      val lpMap = model.pieces.zip(model.logps).toMap
      val ll = census.foldLeft(0.0) { (acc, r) =>
        acc + lpMap.getOrElse(r.getString(0), UnkLogp) * r.getLong(1)
      }
      -ll / nWords
    } finally dict.unpersist()
  }
}
