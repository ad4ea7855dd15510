package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.TextOps

/** Streaming ingest twins of the stored-signature dedup family — a crawl
  * ingest stream dedups each micro-batch against the corpus signature
  * store, then the store learns the batch so the NEXT batch dedups
  * against it too. Three granularities, one store discipline:
  *
  *   - [[spanDedupStream]]       word-window spans  (presence-keyed)
  *   - [[paragraphDedupStream]]  paragraphs         (presence-keyed)
  *   - [[lineDedupStream]]       boilerplate lines  (frequency-counted)
  *
  * Shape: `foreachBatch`, deliberately — per micro-batch each applies
  * its batch operator verbatim (stream-static join against the store as
  * of batch start + the within-batch election/census), so streaming
  * output is BY CONSTRUCTION identical to running the batch operator on
  * each micro-batch in arrival order (the parity StreamingSpecs pin
  * exactly that). A pure declarative stream can't express these
  * operators: the signature table must GROW from the stream's own
  * output (a static join side is frozen per query), and the
  * within-batch election is a corpus-global window (unsupported over
  * unbounded input). Spark's own docs route stream writes that need
  * batch-only machinery through foreachBatch for the same reason.
  *
  * == Store layout and replay idempotency ==
  *
  * The store root holds the SEED as plain parquet files (write it with
  * a normal `.write.parquet(root)`) plus one `b<batchId>` subdirectory
  * per processed micro-batch. Batch writes go `mode("overwrite")` into
  * the batch's own subdirectory, and a batch's read of the store
  * EXCLUDES its own subdirectory — so a replayed micro-batch (driver
  * died after the signature write but before the streaming checkpoint
  * committed) sees exactly the store-as-of-batch-start view, recomputes
  * the identical cleaned output, and overwrites rather than duplicates
  * its signatures. The r12 flat `mode("append")` layout made that
  * replay self-dedup: the store already contained the batch's own
  * surviving hashes, so every previously-kept span/paragraph was
  * deleted as "corpus-owned" and the re-emitted output was silently
  * gutted. `emit` must still be idempotent per `batchId` on its own
  * sink (the standard foreachBatch contract) — this layout makes the
  * STORE side of the transaction idempotent.
  *
  * Scale: the store grows hashes-only (text never stored); reading
  * lists one directory level (cheap even at thousands of batches) and
  * scans hash columns. Long-running streams compact old `b*`
  * subdirectories into the root seed via [[compactStoreInPlace]]
  * (staged invisible write + manifest-completable swap, run it between
  * micro-batches — contract on the method) or [[compactStore]] to a
  * fresh root with a stream re-point; the layout is just "root files +
  * any subdirectories", nothing schema-level.
  */
object IngestDedup {

  /** Parquet inputs of a signature store rooted at `root`: the seed
    * files at the root plus every per-batch subdirectory except
    * `b<excludeBatch>` (a replayed batch must not dedup against its own
    * prior partial write). Empty when the root doesn't exist yet. */
  private[graft] def storeInputs(
      spark: SparkSession,
      root: String,
      excludeBatch: Option[Long]): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(root)
    try {
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      val skip = excludeBatch.map(id => s"b$id")
      fs.listStatus(path).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .filterNot(s => s.isDirectory && skip.contains(s.getPath.getName))
        .map(_.getPath.toString)
    } catch { case _: java.io.FileNotFoundException => Nil }
  }

  /** The store's current view as a single-column DataFrame of
    * `hashCol` (missing/empty store reads as zero rows) — the frame to
    * hand the batch operators, and the compaction read for offline
    * maintenance. `excludeBatch` is the replay guard (see the store
    * layout note above). */
  def readStore(
      spark: SparkSession,
      root: String,
      hashCol: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    val inputs = storeInputs(spark, root, excludeBatch)
    if (inputs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(hashCol, LongType))))
    else spark.read.parquet(inputs: _*).select(col(hashCol))
  }

  /** One span-dedup micro-batch: clean against the store as of batch
    * start, emit, then the store learns the batch's post-removal spans
    * in the batch's own subdirectory (idempotent on replay). The store
    * is signed from the CLEANED text, not the raw batch: removal
    * splices the surviving words together, and downstream training
    * data is the cleaned text, so the spliced windows are precisely
    * what the corpus now contains and what future batches must dedup
    * against. Kept spans become corpus-owned first occurrences;
    * removed spans were corpus-owned already. */
  private[graft] def spanBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: String,
      n: Int,
      textCol: String,
      idCol: String,
      parts: Int)(emit: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val sigs = readStore(spark, sigPath, "span_hash", Some(batchId))
    val cleaned = TextOps.removeDupSpansAgainst(
        batch, sigs, n = n, textCol = textCol, idCol = idCol,
        parts = parts)
      .persist()
    try {
      emit(cleaned, batchId)
      TextOps.spanSignatures(
          cleaned.select(col(idCol), col("clean_text").as(textCol)),
          n = n, textCol = textCol, parts = parts)
        .write.mode("overwrite").parquet(s"$sigPath/b$batchId")
    } finally cleaned.unpersist()
  }

  /** Streaming span-dedup ingest loop — word-window granularity.
    * Per batch, one fan-out-sized hash shuffle (the batch side of
    * [[TextOps.removeDupSpansAgainst]]) + one scan of the store's hash
    * column; hashes only, text never leaves the batch; the store grows
    * by ~one 8-byte hash per new corpus word. `emit` receives the
    * cleaned batch (idCol, clean_text, n_words, n_removed) and the
    * batch id.
    *
    * @param sigPath signature store root — seed it with
    *        [[TextOps.spanSignatures]] of the existing corpus written
    *        to the root, or start empty (a missing path reads as an
    *        empty store); see the store-layout note on [[IngestDedup]] */
  def spanDedupStream(
      stream: DataFrame,
      sigPath: String,
      n: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id",
      parts: Int = 0)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      spanBatch(batch, batchId, sigPath, n, textCol, idCol, parts)(emit)
    }

  /** One paragraph-dedup micro-batch — see [[spanBatch]]; the store
    * learns the batch's SURVIVING paragraphs (unlike word windows,
    * paragraph removal never splices new keys into existence — the
    * cleaned text's paragraphs are exactly the kept originals). */
  private[graft] def paragraphBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: String,
      textCol: String,
      idCol: String,
      minChars: Int,
      parts: Int)(emit: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val sigs = readStore(spark, sigPath, "para_hash", Some(batchId))
    val cleaned = graft.operators.Dedup.dropDupParagraphsAgainst(
        batch, sigs, textCol = textCol, idCol = idCol,
        minChars = minChars, parts = parts)
      .persist()
    try {
      emit(cleaned, batchId)
      graft.operators.Dedup.paragraphSignatures(
          cleaned.select(col(idCol), col("clean_text").as(textCol)),
          textCol = textCol, minChars = minChars, parts = parts)
        .write.mode("overwrite").parquet(s"$sigPath/b$batchId")
    } finally cleaned.unpersist()
  }

  /** Paragraph-granularity sibling of [[spanDedupStream]]: each
    * micro-batch applies
    * [[graft.operators.Dedup.dropDupParagraphsAgainst]] verbatim
    * against the paragraph signature store as of batch start, then the
    * store learns the batch's surviving paragraphs. Same foreachBatch
    * rationale, per-batch batch-operator parity, and replay-idempotent
    * store layout as the span twin.
    *
    * @param sigPath signature store root — seed it with
    *        [[graft.operators.Dedup.paragraphSignatures]] of the
    *        existing corpus written to the root, or start empty */
  def paragraphDedupStream(
      stream: DataFrame,
      sigPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      minChars: Int = 30,
      parts: Int = 0)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      paragraphBatch(batch, batchId, sigPath, textCol, idCol, minChars,
        parts)(emit)
    }

  /** One line-dedup micro-batch — the FREQUENCY-counted member of the
    * family: the store carries (line_hash, n_docs) document-frequency
    * counts, removal is COUNT-INCLUSIVE (store counts as of batch
    * start + the batch's own within-batch census — a line crosses the
    * boilerplate threshold the moment the combined corpus has seen it
    * in more than `maxDf` documents, including crossings caused BY
    * this batch), and the store learns the RAW batch's census: a
    * removed boilerplate line still occurred in those documents, and
    * the honest corpus frequency is what sequential batch-global
    * processing would have counted. Count-inclusive is the
    * within-batch-aware choice the presence-keyed twins also make
    * (their within-batch election removes later batch occurrences),
    * and it makes a single batch over an empty store match
    * [[graft.operators.Dedup.dropCommonLines]] exactly. Inherently
    * non-retroactive: documents emitted before a line crossed the
    * threshold keep it — only a batch re-run of the accumulated corpus
    * removes boilerplate everywhere. */
  private[graft] def lineBatch(
      batch: DataFrame,
      batchId: Long,
      countsPath: String,
      textCol: String,
      idCol: String,
      maxDf: Int)(emit: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val inputs = storeInputs(spark, countsPath, Some(batchId))
    val counts =
      if (inputs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("line_hash", LongType),
            StructField("n_docs", LongType))))
      else spark.read.parquet(inputs: _*).select(col("line_hash"), col("n_docs"))
    val cleaned = graft.operators.Dedup.dropCommonLinesAgainst(
        batch, counts, textCol = textCol, idCol = idCol, maxDf = maxDf)
      .persist()
    try {
      emit(cleaned, batchId)
      graft.operators.Dedup.lineCounts(batch, textCol = textCol, idCol = idCol)
        .write.mode("overwrite").parquet(s"$countsPath/b$batchId")
    } finally cleaned.unpersist()
  }

  /** One doc-level dedup micro-batch — see [[spanBatch]]: the batch's
    * MinHash signatures pair against the store (zero text access on the
    * corpus side), within-batch near-dup components elect a canonical
    * survivor with corpus ownership propagating through clusters
    * ([[graft.operators.Dedup.keepNewAgainstSignatures]]), and the
    * store learns the SURVIVORS' signatures — kept docs become
    * corpus-owned for the next batch. The empty-store schema derives
    * from the batch itself (`minHashSignatures(batch.limit(0))`), so
    * id-column types and signature width always agree with the batch's. */
  private[graft] def docBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: String,
      textCol: String,
      idCol: String,
      shingleN: Int,
      bands: Int,
      rows: Int,
      threshold: Double,
      maxBucket: Int)(emit: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val inputs = storeInputs(spark, sigPath, Some(batchId))
    val corpusSigs =
      if (inputs.isEmpty)
        graft.operators.Dedup.minHashSignatures(batch.limit(0), textCol,
          idCol, shingleN, bands, rows)
      else spark.read.parquet(inputs: _*).select(col("doc_id"), col("sig"))
    val kept = graft.operators.Dedup.keepNewAgainstSignatures(
        batch, corpusSigs, textCol = textCol, idCol = idCol,
        shingleN = shingleN, bands = bands, rows = rows,
        threshold = threshold, maxBucket = maxBucket)
      .persist()
    try {
      emit(kept, batchId)
      graft.operators.Dedup.minHashSignatures(kept, textCol, idCol,
          shingleN, bands, rows)
        .write.mode("overwrite").parquet(s"$sigPath/b$batchId")
    } finally kept.unpersist()
  }

  /** Doc-granularity member of the ingest family — the GROWING-store
    * near-dup keep loop ([[graft.operators.Dedup.nearDupStreamFromSignatures]]
    * is the flag-only variant over a FROZEN store: a declarative
    * stream-static join cannot learn from its own output, which is why
    * this twin is foreachBatch like its span/paragraph/line siblings).
    * Each micro-batch keeps only documents that near-dup neither the
    * accumulated corpus nor a kept batch sibling, then the store learns
    * the survivors' signatures. `emit` receives the kept rows (the
    * batch's own columns, unchanged) and the batch id. Store layout and
    * replay idempotency: see [[IngestDedup]].
    *
    * @param sigPath signature store root — seed it with
    *        [[graft.operators.Dedup.minHashSignatures]] of the existing
    *        corpus written to the root, or start empty */
  def docDedupStream(
      stream: DataFrame,
      sigPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 100000)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      docBatch(batch, batchId, sigPath, textCol, idCol, shingleN, bands,
        rows, threshold, maxBucket)(emit)
    }

  /** Shared per-batch body of the perceptual-media ingest members
    * ([[imageDedupStream]]/[[audioDedupStream]]): `feats` must carry
    * (idCol, okCol boolean, sigCol long). Within-batch near-dup
    * clusters collapse to their canonical first, the canonicals gate
    * against the accumulated store (16-bit pigeonhole banding both
    * ways), survivors' signatures land in the `b<batchId>` subdir. */
  private[graft] def mediaSigBatch(
      feats0: DataFrame,
      batchId: Long,
      sigPath: String,
      idCol: String,
      okCol: String,
      sigCol: String,
      maxDist: Int,
      maxBucket: Int)(emit: (DataFrame, Long) => Unit): Unit = {
    val spark = feats0.sparkSession
    val feats = feats0.persist()
    try {
      val sigs = feats.where(col(okCol))
        .select(col(idCol).as("doc_id"), col(sigCol).as("sig"))
      // within-batch near-dup clusters collapse to their canonical
      // (lowest id) FIRST; corpus ownership then propagates through the
      // cluster: if the canonical is corpus-owned the whole cluster is
      // (its members were near-dups of a corpus near-dup)
      val within = graft.operators.Dedup.simHashPairsFromSignatures(
        sigs, maxDist = maxDist, maxBucket = maxBucket)
      val canon = graft.operators.Dedup.keepCanonical(sigs, within)
      val inputs = storeInputs(spark, sigPath, Some(batchId))
      val owned =
        if (inputs.isEmpty)
          canon.limit(0).select(col("doc_id").as("doc_new"))
        else graft.operators.Dedup.simHashPairsAgainstSignatures(
            canon, spark.read.parquet(inputs: _*)
              .select(col(idCol).as("doc_id"), col(sigCol).as("sig")),
            maxDist = maxDist, maxBucket = maxBucket)
          .select(col("doc_new")).distinct()
      val kept = canon.join(owned,
        canon("doc_id") === owned("doc_new"), "left_anti")
      // undecodable payloads PASS flagged (no samples/pixels → nothing
      // to match; dropping them silently would gut corrupt-but-wanted
      // rows, and a curation gate wants to route them, not lose them)
      val keptOut = feats.where(!col(okCol))
        .select(col(idCol), col(okCol),
          lit(null).cast("long").as(sigCol))
        .unionByName(kept.select(col("doc_id").as(idCol),
          lit(true).as(okCol), col("sig").as(sigCol)))
      emit(keptOut, batchId)
      kept.select(col("doc_id").as(idCol), col("sig").as(sigCol))
        .write.mode("overwrite").parquet(s"$sigPath/b$batchId")
    } finally feats.unpersist()
  }

  private[graft] def imageBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: String,
      bytesCol: String,
      idCol: String,
      maxDist: Int,
      maxBucket: Int,
      sigCol: String = "ahash")(emit: (DataFrame, Long) => Unit): Unit = {
    require(Set("ahash", "dhash", "phash")(sigCol),
      s"sigCol must be one of ahash/dhash/phash, got '$sigCol'")
    mediaSigBatch(
      graft.operators.Multimodal.imageFeatures(batch, bytesCol, idCol)
        .select(col(idCol), col("decode_ok"), col(sigCol)),
      batchId, sigPath, idCol, "decode_ok", sigCol, maxDist, maxBucket)(emit)
  }

  /** Image-granularity member of the ingest family: each micro-batch
    * decodes pixels ONCE ([[graft.operators.Multimodal.imageFeatures]]),
    * drops images whose perceptual hash is within `maxDist` Hamming bits
    * of the accumulated corpus OR of a kept batch sibling (16-bit
    * pigeonhole banding both ways — never an all-pairs comparison), and
    * the store learns the survivors' signatures under the
    * replay-idempotent `b<batchId>` layout (see [[IngestDedup]]). `emit`
    * receives (idCol, decode_ok, sigCol) for the kept rows — undecodable
    * payloads pass with decode_ok=false and a NULL hash, by contract.
    * Store rows are (idCol, sigCol): 16 bytes per corpus image,
    * text/pixels never stored.
    *
    * @param sigPath signature store root — seed it with the existing
    *        corpus' (idCol, sigCol) rows written to the root, or start
    *        empty
    * @param sigCol which perceptual hash gates: "ahash" (default —
    *        recompression/resize dups), "dhash" (local gradient
    *        structure) or "phash" (DCT frequency structure — more
    *        discriminative on low-detail images, where many aHash cells
    *        sit near the global mean and flip under small
    *        perturbations). One store = one sigCol: the stored
    *        signature column is named after it, so mixing variants
    *        against the same sigPath fails loudly on read rather than
    *        silently comparing incompatible hash spaces */
  def imageDedupStream(
      stream: DataFrame,
      sigPath: String,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      maxDist: Int = 3,
      maxBucket: Int = 100000,
      sigCol: String = "ahash")(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      imageBatch(batch, batchId, sigPath, bytesCol, idCol, maxDist,
        maxBucket, sigCol)(emit)
    }

  /** Audio-granularity member of the ingest family — the waveform twin
    * of [[imageDedupStream]]: each micro-batch decodes WAV PCM samples
    * once ([[graft.operators.Multimodal.wavEnvelopeSigs]]), drops clips
    * whose 64-bucket envelope hash is within `maxDist` Hamming bits of
    * the accumulated corpus OR of a kept batch sibling, and the store
    * learns the survivors' signatures. The envelope hash is exactly
    * amplitude-scale and resample invariant (a regained/resampled
    * re-encode of a stored clip gates at distance 0) but NOT time-shift
    * invariant — excerpts pass. Non-PCM payloads pass flagged
    * (pcm_ok=false, NULL hash), same routing contract as the image
    * member. Default `maxDist = 1`: envelope buckets are coarse, so a
    * 64-bit signature flips few bits under benign re-encoding. */
  def audioDedupStream(
      stream: DataFrame,
      sigPath: String,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      maxDist: Int = 1,
      maxBucket: Int = 100000)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mediaSigBatch(
        graft.operators.Multimodal.wavEnvelopeSigs(batch, bytesCol, idCol),
        batchId, sigPath, idCol, "pcm_ok", "env_hash", maxDist,
        maxBucket)(emit)
    }

  /** Offline store maintenance: fold a store's accumulated per-batch
    * subdirectories (plus the existing root seed) into ONE compacted
    * table at `outRoot` — presence stores (`countCol = None`) dedup on
    * `keyCols` (span/paragraph hashes re-appended across batches, doc
    * signature rows), count stores (`countCol = Some("n_docs")`) SUM per
    * key. Write the result as the new seed root and point the stream's
    * checkpointed query at it; reading a store is one directory listing
    * + a scan either way, so compaction is about long-tail file counts
    * and store-side aggregation cost, not correctness.
    *
    * CONCURRENCY CONTRACT (new-root form): writing to a fresh `outRoot`
    * never mutates `root`, so a live stream reading `root` is
    * unaffected; the re-point to `outRoot` is the caller's
    * stop-the-stream step. For compaction WITHOUT a re-point, use
    * [[compactStoreInPlace]] and its staged-swap contract. */
  def compactStore(
      spark: SparkSession,
      root: String,
      outRoot: String,
      keyCols: Seq[String],
      countCol: Option[String] = None): Unit = {
    val inputs = storeInputs(spark, root, None)
    require(inputs.nonEmpty, s"nothing to compact at $root")
    writeCompacted(spark, inputs, keyCols, countCol, outRoot,
      mode = "errorifexists")
  }

  private def writeCompacted(
      spark: SparkSession,
      inputs: Seq[String],
      keyCols: Seq[String],
      countCol: Option[String],
      out: String,
      mode: String): Unit = {
    val all = spark.read.parquet(inputs: _*)
    val compacted = countCol match {
      case Some(c) => all.groupBy(keyCols.map(col): _*)
        .agg(org.apache.spark.sql.functions.sum(col(c)).as(c))
      case None => all.select((keyCols ++
          all.columns.filterNot(keyCols.contains)).distinct.map(col): _*)
        .dropDuplicates(keyCols)
    }
    compacted.write.mode(mode).parquet(out)
  }

  /** In-place store compaction with a STAGED SWAP — the long-running-
    * stream maintenance path (no checkpoint re-point needed).
    *
    * Protocol, in order, with every intermediate state accounted for:
    *   1. any interrupted prior swap is completed first (see manifest
    *      below);
    *   2. the compacted table is written to `root/.compact_tmp` —
    *      dot-prefixed, so [[storeInputs]]/[[readStore]] NEVER list it:
    *      staging is invisible to readers and a crash here costs
    *      nothing;
    *   3. a `.compact_manifest` (also invisible) records the swap —
    *      stamp + the exact input files/dirs captured at step 2 — so
    *      the swap is completable after any crash;
    *   4. staged files move to the root as `compact-<stamp>-*` (one
    *      rename each), THEN the old inputs are deleted, then
    *      tmp + manifest are removed.
    *
    * Crash recovery: a crash before the manifest leaves only invisible
    * staging (cleaned next run); a crash after it is completed by the
    * next [[compactStoreInPlace]] call — remaining staged files move,
    * listed old inputs delete, nothing is recomputed. The staged table
    * is always the FULL compacted store, so recovery never double-sums
    * a count store.
    *
    * Concurrent readers: the store is only ever mutated between steps 4's
    * renames and deletes. A reader listing in that window sees old+new
    * together — duplicate keys, harmless to a presence store's
    * anti-join/dedup semantics but a transient double-count for count
    * stores. A reader that listed BEFORE a delete and scans after fails
    * its micro-batch (vanished input file). The SAFE contract is
    * therefore: run in-place compaction BETWEEN micro-batches (e.g. from
    * the foreachBatch callback's tail, or with the stream stopped); the
    * swap ordering bounds the damage of a violated contract to one
    * retryable batch, never a corrupted store. */
  def compactStoreInPlace(
      spark: SparkSession,
      root: String,
      keyCols: Seq[String],
      countCol: Option[String] = None): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    recoverSwap(fs, rootPath) // step 1
    val inputs = storeInputs(spark, root, None)
    require(inputs.nonEmpty, s"nothing to compact at $root")
    val tmp = new org.apache.hadoop.fs.Path(rootPath, CompactTmp)
    fs.delete(tmp, true) // stale pre-manifest staging from a crashed run
    writeCompacted(spark, inputs, keyCols, countCol, tmp.toString,
      mode = "overwrite") // step 2: invisible staging
    val stamp = java.lang.Long.toHexString(System.nanoTime())
    val manifest = new org.apache.hadoop.fs.Path(rootPath, CompactManifest)
    val os = fs.create(manifest, true) // step 3: swap becomes completable
    os.write((stamp + "\n" + inputs.mkString("\n")).getBytes("UTF-8"))
    os.close()
    finishSwap(fs, rootPath, stamp, inputs) // step 4
  }

  private val CompactTmp = ".compact_tmp"
  private val CompactManifest = ".compact_manifest"

  /** Complete a swap: move remaining staged data files to the root under
    * `compact-<stamp>-` names, delete the recorded old inputs, drop
    * staging + manifest. Idempotent — every step tolerates having
    * already happened. */
  private def finishSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: org.apache.hadoop.fs.Path,
      stamp: String,
      oldInputs: Seq[String]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(rootPath, CompactTmp)
    if (fs.exists(tmp))
      fs.listStatus(tmp).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith("."))
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(rootPath, s"compact-$stamp-$n"))
      }
    oldInputs.foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    fs.delete(tmp, true)
    fs.delete(new org.apache.hadoop.fs.Path(rootPath, CompactManifest), false)
  }

  /** Complete an interrupted [[compactStoreInPlace]] swap, if any. */
  private def recoverSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: org.apache.hadoop.fs.Path): Unit = {
    val manifest = new org.apache.hadoop.fs.Path(rootPath, CompactManifest)
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = txt.split("\n").toSeq
    finishSwap(fs, rootPath, lines.head, lines.tail.filter(_.nonEmpty))
  }

  /** Streaming boilerplate-line filter against accumulated corpus line
    * frequencies — the line-granularity member of the ingest family.
    * Per batch: one explode scan, the batch's distinct-doc line census
    * (one hash shuffle), a hash equi-join against the store's summed
    * counts, and one doc-id shuffle to reassemble; the store grows by
    * one (hash, count) row per distinct line per batch. `emit`
    * receives (idCol, clean_text, n_lines, n_removed) and the batch
    * id. Semantics, store-append choice, and the non-retroactivity
    * caveat: see [[lineBatch]].
    *
    * @param countsPath count store root — seed it with
    *        [[graft.operators.Dedup.lineCounts]] of the existing
    *        corpus written to the root, or start empty */
  def lineDedupStream(
      stream: DataFrame,
      countsPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDf: Int = 30)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      lineBatch(batch, batchId, countsPath, textCol, idCol, maxDf)(emit)
    }
}
