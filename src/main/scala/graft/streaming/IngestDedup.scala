package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.TextOps

/** Streaming ingest twin of the stored-signature span dedup — the
  * missing member of the at-ingest family beside
  * [[graft.operators.Dedup.nearDupStreamFromSignatures]] (doc-level
  * MinHash) and its SimHash sibling: a crawl ingest stream span-dedups
  * each micro-batch against the corpus signature store, then the store
  * learns the batch's surviving spans so the NEXT batch dedups against
  * them too.
  *
  * Shape: `foreachBatch`, deliberately — per micro-batch this applies
  * [[TextOps.removeDupSpansAgainst]] verbatim (stream-static join
  * against the store as of batch start + the within-batch
  * first-occurrence election), so streaming output is BY CONSTRUCTION
  * identical to running the batch operator on each micro-batch in
  * arrival order (the parity StreamingSpec pins exactly that). A pure
  * declarative stream can't express this operator: the signature table
  * must GROW from the stream's own output (a static join side is frozen
  * per query), the within-batch election is a corpus-global window
  * (unsupported over unbounded input), and the signature append must
  * commit atomically with the emitted batch — all three are
  * `foreachBatch` semantics. Spark's own docs route stream writes that
  * need batch-only machinery through foreachBatch for the same reason.
  *
  * The store is signed from the CLEANED text, not the raw batch:
  * removal splices the surviving words together, and downstream
  * training data is the cleaned text, so the spliced windows are
  * precisely what the corpus now contains and what future batches must
  * dedup against. Kept spans become corpus-owned first occurrences;
  * removed spans were corpus-owned already.
  *
  * Scale: per batch, one fan-out-sized hash shuffle (the batch side of
  * removeDupSpansAgainst) + one scan of the store's hash column —
  * hashes only, text never leaves the batch; the store grows by ~one
  * 8-byte hash per new corpus word. `emit` receives the cleaned batch
  * (idCol, clean_text, n_words, n_removed) and the batch id.
  *
  * @param sigPath parquet directory of (span_hash) — seed it with
  *        [[TextOps.spanSignatures]] of the existing corpus (or start
  *        empty: a missing path reads as an empty store) */
object IngestDedup {
  def spanDedupStream(
      stream: DataFrame,
      sigPath: String,
      n: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id",
      parts: Int = 0)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val sigs =
        try spark.read.parquet(sigPath).select(col("span_hash"))
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              StructType(Seq(StructField("span_hash", LongType))))
        }
      val cleaned = TextOps.removeDupSpansAgainst(
          batch, sigs, n = n, textCol = textCol, idCol = idCol,
          parts = parts)
        .persist()
      try {
        emit(cleaned, batchId)
        // store learns this batch's post-removal spans; the operator
        // dedups its join side internally, so re-appended known splice
        // hashes cost bytes, never correctness
        TextOps.spanSignatures(
            cleaned.select(col(idCol), col("clean_text").as(textCol)),
            n = n, textCol = textCol, parts = parts)
          .write.mode("append").parquet(sigPath)
      } finally cleaned.unpersist()
    }

  /** Paragraph-granularity sibling of [[spanDedupStream]]: each
    * micro-batch applies
    * [[graft.operators.Dedup.dropDupParagraphsAgainst]] verbatim
    * against the paragraph signature store as of batch start, then the
    * store learns the batch's SURVIVING paragraphs (unlike word
    * windows, paragraph removal never splices new keys into existence —
    * the cleaned text's paragraphs are exactly the kept originals).
    * Same foreachBatch rationale and per-batch batch-operator parity as
    * the span twin.
    *
    * @param sigPath parquet directory of (para_hash) — seed it with
    *        [[graft.operators.Dedup.paragraphSignatures]] of the
    *        existing corpus, or start empty (missing path reads as an
    *        empty store) */
  def paragraphDedupStream(
      stream: DataFrame,
      sigPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      minChars: Int = 30,
      parts: Int = 0)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val sigs =
        try spark.read.parquet(sigPath).select(col("para_hash"))
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              StructType(Seq(StructField("para_hash", LongType))))
        }
      val cleaned = graft.operators.Dedup.dropDupParagraphsAgainst(
          batch, sigs, textCol = textCol, idCol = idCol,
          minChars = minChars, parts = parts)
        .persist()
      try {
        emit(cleaned, batchId)
        graft.operators.Dedup.paragraphSignatures(
            cleaned.select(col(idCol), col("clean_text").as(textCol)),
            textCol = textCol, minChars = minChars, parts = parts)
          .write.mode("append").parquet(sigPath)
      } finally cleaned.unpersist()
    }
}
