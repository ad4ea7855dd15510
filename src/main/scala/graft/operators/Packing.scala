package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed-token-budget training sequences ("concat-then-chunk" packing — a
  * document belongs to the sequence its start offset falls in, documents
  * are laid out contiguously in a deterministic order).
  *
  * Scale shape: documents are first scattered into `buckets` independent
  * packing streams by id hash (so a 100 TB corpus packs with `buckets`-way
  * parallelism instead of one global sequential scan), then one window
  * cumulative sum per bucket assigns offsets. One shuffle on the bucket
  * key; the per-bucket sort is Spark's spillable window sort. Bucket count
  * trades parallelism against cross-bucket packing waste (< one sequence
  * per bucket).
  *
  * Deterministic and engine-portable: bucket = md5-hash of the id, order =
  * id — the DuckDB oracle replays the identical layout.
  */
object Packing {

  /** Returns the input plus `pack_bucket`, `seq_id` (globally unique:
    * bucket * 2^40 + index-within-bucket), `seq_offset` (token offset of
    * the document's start inside its sequence) and `token_count`.
    *
    * Sizing rule for `buckets`: parallelism equals `buckets` (each bucket
    * is one window-sort task), while cross-bucket packing waste is bounded
    * by < one sequence (`budget` tokens) per bucket — so choose the
    * largest `buckets` for which `buckets · budget` is still negligible
    * against total corpus tokens. At 100 TB (~25T tokens) even 10⁵ buckets
    * with a 4k budget wastes < 4·10⁸ tokens (1.6·10⁻⁵ of the corpus); the
    * binding constraint is task granularity, not waste. The default 4096
    * keeps ~25 GB of text per task at 100 TB; raise it proportionally for
    * larger corpora, lower it only below ~10⁸ tokens where per-bucket
    * waste starts to matter. */
  def packSequences(
      docs: DataFrame,
      budget: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 4096): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(buckets > 0 && buckets <= (1 << 23), "buckets must fit the 2^40 seq_id split")
    val bucket = pmod(TextOps.portableHash60(col(idCol).cast("string")), lit(buckets))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_bucket")).orderBy(col(idCol))
    val tok = TextOps.tokenCount(col(textCol)).cast("long")
    // offsets come from a window over the SLIM (id, count, bucket)
    // projection — the document payload must never ride the per-bucket
    // window sort (at 20M docs that sort goes external and the operator
    // turned 37× for 10× data; packGreedy's slim fold was always linear).
    // The payload instead takes ONE volume-sized hash shuffle into a
    // shuffled-hash join against the slim assignment (build side is
    // ~24 B/row), so it is never sorted anywhere in the plan.
    val assigned = docs
      .select(col(idCol), bucket.as("pack_bucket"), tok.as("token_count"))
      .withColumn("__start",
        coalesce(sum(col("token_count")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("seq_id",
        col("pack_bucket").cast("long") * lit(1L << 40) +
          floor(col("__start") / budget))
      .withColumn("seq_offset", col("__start") % budget)
      .drop("__start")
    // size the payload join to input volume, but only force a partition
    // count when it exceeds the session setting (an explicit repartition
    // disables AQE's downward coalescing — pure overhead at small scale)
    val parts = TextOps.volumeParts(docs)
    val sessionParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val (lhs, rhs) =
      if (parts > sessionParts)
        (docs.repartition(parts, col(idCol)), assigned.repartition(parts, col(idCol)))
      else (docs, assigned)
    lhs.join(rhs.hint("shuffle_hash"), Seq(idCol))
      .select(docs.columns.map(col) ++
        Seq(col("pack_bucket"), col("token_count"), col("seq_id"), col("seq_offset")): _*)
  }

  /** Small-file COMPACTION plan — the lakehouse maintenance shape: a
    * (path, bytes) file census in, bin assignments out, each bin one
    * rewrite task targeting `targetBytes`. Exactly [[packGreedy]]'s
    * bucketed whole-item fold with bytes as the budget unit: files
    * never split, oversized files take a bin alone, assignment moves
    * only (path, bytes, bucket) through one slim shuffle — a 10M-file
    * census plans in seconds. Output: (pathCol, bytes, pack_bucket,
    * bin_id). */
  def compactionPlan(
      files: DataFrame,
      targetBytes: Int,
      pathCol: String = "path",
      sizeCol: String = "bytes",
      buckets: Int = 4096): DataFrame =
    packGreedy(files, targetBytes, textCol = pathCol, idCol = pathCol,
      buckets = buckets, tokens = Some(col(sizeCol)))
      .withColumnRenamed("token_count", "bytes")
      .withColumnRenamed("seq_id", "bin_id")

  /** Whole-document greedy packing: unlike [[packSequences]] (which may
    * split a document across a sequence boundary) every document lands
    * entirely in ONE training sequence; the open sequence closes as soon
    * as the next document does not fit, and an over-budget document gets a
    * singleton sequence. Same deterministic layout contract as
    * [[packSequences]]: bucket = portable md5 id hash, order = id — an
    * ANSI engine replays the exact layout with a linear recursion over
    * each bucket.
    *
    * Scale shape: one shuffle on the bucket key, spillable partition sort,
    * then a per-partition streaming fold with O(1) state (the open
    * sequence's fill) — no window, no per-bucket buffering. Greedy-no-split
    * waste is < budget per closed sequence in the worst case; keeping id
    * order (rather than first-fit-decreasing) is what makes the layout
    * stable run-over-run and oracle-replayable — callers wanting tighter
    * packing can pre-sort by length and re-id.
    *
    * @return (idCol, token_count, pack_bucket, seq_id) — seq_id globally
    *   unique as bucket * 2^40 + sequence-index-within-bucket */
  def packGreedy(
      docs: DataFrame,
      budget: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 4096,
      tokens: Option[Column] = None): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(buckets > 0 && buckets <= (1 << 23), "buckets must fit the 2^40 seq_id split")
    val bucket = pmod(TextOps.portableHash60(col(idCol).cast("string")), lit(buckets))
    // `tokens` overrides the whitespace token count — e.g. size(token_ids)
    // when packing an already-tokenized corpus (emitPackedIds)
    val tokCol = tokens.getOrElse(TextOps.tokenCount(col(textCol)).cast("long"))
    val slim = docs
      .select(col(idCol), tokCol.cast("long").as("token_count"),
        bucket.as("pack_bucket"))
      .repartition(col("pack_bucket"))
      .sortWithinPartitions(col("pack_bucket"), col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(slim.schema.fields :+
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false))
    val b = budget.toLong
    slim.mapPartitions { rows =>
      var curBucket: Any = null
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        val bkt = r.get(2)
        if (!java.util.Objects.equals(bkt, curBucket)) {
          curBucket = bkt; bin = -1L; fill = Long.MaxValue
        }
        val len = r.getLong(1)
        // overflow-safe fill + len > budget (fill can be Long.MaxValue)
        if (fill > b - len) { bin += 1; fill = len } else fill += len
        org.apache.spark.sql.Row(r.get(0), len, r.getLong(2),
          r.getLong(2) * (1L << 40) + bin)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Materialize whole-document packed TRAINING SEQUENCES — the artifact
    * a trainer actually reads: one row per sequence with the member
    * documents' token ids concatenated in id order and right-padded to
    * `budget` with `padId` (an over-budget document keeps its singleton
    * sequence unpadded-overlong — the caller decides truncation policy).
    * Layout is [[packGreedy]]'s (deterministic, oracle-replayable).
    *
    * Scale shape: sequence ASSIGNMENT stays payload-free (packGreedy's
    * slim fold moves only ids+counts); the token payload then moves
    * exactly twice — the id-keyed join that attaches seq_id, and the
    * seq_id-keyed aggregation that concatenates. Both are equi-shuffles
    * whose keys grow with the corpus, so the materialization scales out
    * with executors.
    *
    * `doc_lens` / `doc_starts` (both in member-id order) are the
    * doc-boundary metadata a trainer consumes to reset attention masks at
    * document boundaries: `doc_starts(i)` is the token offset where the
    * i-th member document begins inside the sequence, `doc_lens(i)` its
    * token count (so boundaries are also recoverable from either alone).
    *
    * @param idsCol array<int> column of BPE token ids ([[graft.operators.Bpe.tokenizeIds]])
    * @param tokens optional exact token-count column used by the SLIM
    *   assignment side instead of `size(idsCol)`. It MUST equal
    *   `size(idsCol)` row-for-row (the assignment replays against it).
    *   Point: when `idsCol` is an expensive UNMATERIALIZED expression
    *   (per-word hashing, BPE segmentation), the census pass otherwise
    *   re-evaluates the whole tokenizer just to take `size(...)` — a
    *   caller that can produce the count without the per-token work
    *   (e.g. `size` of the pre-transform word array, since `transform`
    *   is length-preserving) halves the corpus-scan cost.
    *   VIOLATION SIGNATURE: the contract is enforced only by the caller
    *   — a divergent override corrupts the layout silently (assignment
    *   packs against the override while `n_tokens`/`doc_lens` derive
    *   from the actual ids), so sequences can exceed `budget` or waste
    *   it. Diagnose with the audit query
    *   `df.select(sum(tokens), sum(size(col(idsCol)))).first` — the two
    *   sums must be equal.
    * @return (seq_id, n_docs, n_tokens, doc_lens, doc_starts, token_ids) */
  def emitPackedIds(
      docs: DataFrame,
      budget: Int,
      idsCol: String = "token_ids",
      idCol: String = "doc_id",
      buckets: Int = 4096,
      padId: Int = 0,
      tokens: Option[Column] = None): DataFrame = {
    val ids = docs.select(col(idCol), col(idsCol))
    val assigned = packGreedy(docs, budget, idCol = idCol, buckets = buckets,
        tokens = Some(tokens.getOrElse(size(col(idsCol))).cast("long")))
      .select(col(idCol), col("seq_id"))
    // volume-sized id shuffle for the one payload-carrying join (only
    // forced when sizing past the session setting — see packSequences);
    // the assignment side stays the slim (id, seq_id) build side.
    // Sized from the projected payload frame (`ids`), not the full input:
    // caller frames may carry columns (raw text) that never ride the
    // join, and an inflated estimate forces an explicit repartition past
    // the session setting, which disables AQE's downward coalescing
    val parts = TextOps.volumeParts(ids)
    val sessionParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val (lhs, rhs) =
      if (parts > sessionParts)
        (ids.repartition(parts, col(idCol)), assigned.repartition(parts, col(idCol)))
      else (ids, assigned)
    lhs.join(rhs.hint("shuffle_hash"), Seq(idCol))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col(idCol).as("i"), col(idsCol).as("v"))))
          .as("__m"))
      .withColumn("__ids", flatten(transform(col("__m"), e => e("v"))))
      .withColumn("doc_lens", transform(col("__m"), e => size(e("v"))))
      .withColumn("doc_starts",
        slice(aggregate(col("doc_lens"), array(lit(0)),
          (acc, x) => concat(acc, array(element_at(acc, -1) + x))),
          lit(1), size(col("doc_lens"))))
      .withColumn("n_tokens", size(col("__ids")))
      .withColumn("token_ids",
        concat(col("__ids"), array_repeat(lit(padId),
          greatest(lit(0), lit(budget) - size(col("__ids"))))))
      .select("seq_id", "n_docs", "n_tokens", "doc_lens", "doc_starts", "token_ids")
  }

  /** Materialize CONCAT-THEN-CHUNK packed training sequences — the
    * GPT-style packing where the per-bucket token stream is chunked into
    * fixed `budget`-token sequences and documents SPLIT across sequence
    * boundaries (zero waste except each bucket's padded tail), vs
    * [[emitPackedIds]]'s whole-document greedy layout. Layout is
    * [[packSequences]]'s (deterministic: bucket = portable md5 id hash,
    * docs laid contiguously in id order), so every sequence holds exactly
    * `budget` tokens except the last of each bucket (right-padded with
    * `padId`).
    *
    * `doc_lens` / `doc_starts` describe the document SEGMENTS present in
    * the sequence, in id order (a split document contributes a segment to
    * each sequence it touches): `doc_starts(i)` is the token offset where
    * segment i begins, `doc_lens(i)` its length — the attention-mask
    * reset points.
    *
    * Scale shape: the offset assignment is the slim window (payload-free);
    * each doc then fans out into its ⌈span/budget⌉ segment rows on the
    * SLIM side, the payload joins once by id (volume-sized shuffled-hash
    * join, never sorted), segments are sliced per row, and one seq_id
    * aggregation concatenates — the payload moves exactly twice, with
    * ~(1 + tokens/budget per doc) duplication bounded by the chunk count.
    *
    * @param idsCol array<int> column of BPE token ids
    * @param tokens optional exact token-count column for the SLIM
    *   assignment side — same contract and rationale as
    *   [[emitPackedIds]]: must equal `size(idsCol)` row-for-row (same
    *   violation signature and `sum(tokens)` audit query); spares the
    *   offset-census pass from re-evaluating an expensive unmaterialized
    *   `idsCol` expression.
    * @return (seq_id, n_docs, n_tokens, doc_lens, doc_starts, token_ids) */
  def emitPackedChunks(
      docs: DataFrame,
      budget: Int,
      idsCol: String = "token_ids",
      idCol: String = "doc_id",
      buckets: Int = 4096,
      padId: Int = 0,
      tokens: Option[Column] = None): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(buckets > 0 && buckets <= (1 << 23), "buckets must fit the 2^40 seq_id split")
    val ids = docs.select(col(idCol), col(idsCol))
    val bucket = pmod(TextOps.portableHash60(col(idCol).cast("string")), lit(buckets))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_bucket")).orderBy(col(idCol))
    val b = budget.toLong
    // slim offset assignment, then per-doc fan-out into the sequences the
    // doc's token span touches — all on (id, n, start) rows only
    val segs = docs
      .select(col(idCol), tokens.getOrElse(size(col(idsCol))).cast("long").as("__n"),
        bucket.as("pack_bucket"))
      .withColumn("__start",
        coalesce(sum(col("__n")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__n"), col("__start"), col("pack_bucket"),
        explode(sequence(floor(col("__start") / b),
          floor((col("__start") + col("__n") - 1) / b))).as("__k"))
      .select(col(idCol),
        (col("pack_bucket") * lit(1L << 40) + col("__k")).as("seq_id"),
        greatest(lit(0L), col("__k") * b - col("__start")).cast("int").as("__from"),
        least(col("__n"), (col("__k") + 1) * b - col("__start")).cast("int").as("__to"),
        greatest(lit(0L), col("__start") - col("__k") * b).cast("int").as("__at"))
    // sized from the projected payload frame — same rationale as
    // emitPackedIds (caller frames may carry never-joined columns)
    val parts = TextOps.volumeParts(ids)
    val sessionParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val (lhs, rhs) =
      if (parts > sessionParts)
        (ids.repartition(parts, col(idCol)), segs.repartition(parts, col(idCol)))
      else (ids, segs)
    lhs.join(rhs.hint("shuffle_hash"), Seq(idCol))
      .select(col("seq_id"), col("__at"),
        slice(col(idsCol), col("__from") + 1, col("__to") - col("__from")).as("__seg"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("__at").as("a"), col("__seg").as("v"))))
          .as("__m"))
      .withColumn("__ids", flatten(transform(col("__m"), e => e("v"))))
      .withColumn("doc_lens", transform(col("__m"), e => size(e("v"))))
      .withColumn("doc_starts", transform(col("__m"), e => e("a")))
      .withColumn("n_tokens", size(col("__ids")))
      .withColumn("token_ids",
        concat(col("__ids"), array_repeat(lit(padId),
          greatest(lit(0), lit(budget) - size(col("__ids"))))))
      .select("seq_id", "n_docs", "n_tokens", "doc_lens", "doc_starts", "token_ids")
  }

  /** Deterministic training-shard assignment — the "global shuffle then
    * shard" step a training run needs so examples are decorrelated from
    * crawl/source order while the layout stays reproducible run-over-run
    * and across reshardings (membership and order depend only on the row
    * id, never on input partitioning). Rows scatter into `shards` streams
    * by id hash; within a shard rows are ranked in hash order (ties by
    * id), which is the decorrelated read order.
    *
    * One shuffle on the shard key; the per-shard rank is Spark's
    * spillable window sort. Parallelism equals `shards` — size it like
    * `buckets` in [[packSequences]] (hundreds of MB to a few GB of
    * examples per shard). Same portable md5 hash as packing, so any
    * ANSI engine replays the identical layout.
    *
    * @return input + `shard` (int), `shard_pos` (long, dense 0..n-1
    *   within each shard in hash order) */
  def shardForTraining(
      docs: DataFrame,
      shards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", TextOps.portableHash60(col(idCol).cast("string")))
      .withColumn("shard", pmod(col("__h"), lit(shards)).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .drop("__h")
  }

  /** Per-shard audit manifest of [[shardForTraining]]'s layout — the
    * sidecar a training job validates before reading (did every shard
    * land, with the doc/token counts and membership the writer intended):
    * doc count, token and char totals, id range, and an order-insensitive
    * membership checksum (sum of each member's portable id hash mod
    * 1000003 — any added/dropped/substituted doc shifts it; mod keeps the
    * running sum overflow-free to ~9·10¹² docs per shard and the figure
    * replayable by any ANSI engine).
    *
    * One aggregation keyed on the shard id (map-side partial combine —
    * the shuffle carries `shards` rows per partition); the window sort in
    * shardForTraining is not needed for totals, so the manifest derives
    * the shard key directly from the hash.
    *
    * @return (shard, n_docs, n_tokens, n_chars, min_id, max_id,
    *         fingerprint) */
  def shardManifest(
      docs: DataFrame,
      shards: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = TextOps.portableHash60(col(idCol).cast("string"))
    docs
      .groupBy(pmod(h, lit(shards)).cast("int").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(h % lit(1000003L)).as("fingerprint"))
  }

  /** Packing-efficiency audit of a materialized packed table
    * ([[emitPackedIds]] / [[emitPackedChunks]] output): sequences, member
    * docs, payload vs padding tokens, fill extremes, mean docs per
    * sequence — the fill-rate numbers a training job checks before
    * burning GPU-hours on padding. One aggregation over sequence rows
    * (already corpus/budget-sized); fraction columns are raw-double
    * divisions of exact longs, bit-replayable by any engine. */
  def packStats(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val seqs = count(lit(1))
    val payload = sum(col("n_tokens"))
    packed.agg(
      seqs.as("n_seqs"),
      sum(col("n_docs")).as("n_docs"),
      payload.as("payload_tokens"),
      (seqs * budget - payload).as("pad_tokens"),
      ((seqs * budget - payload).cast("double") / (seqs * budget))
        .as("pad_frac"),
      min(col("n_tokens")).as("min_fill"),
      max(col("n_tokens")).as("max_fill"),
      (sum(col("n_docs")).cast("double") / seqs).as("mean_docs_per_seq"))
  }

  /** Materialize [[shardForTraining]]'s layout on disk: one
    * `shard=N/` directory per shard, rows inside each file in
    * `shard_pos` order (the decorrelated read order a data loader
    * consumes sequentially). The repartition keys each shard to one
    * task, so a shard is one ordered file; when shards collide on a
    * task the within-partition sort still keeps each file ordered. */
  def writeShards(
      docs: DataFrame,
      path: String,
      shards: Int,
      idCol: String = "doc_id",
      format: String = "parquet"): Unit =
    shardForTraining(docs, shards, idCol)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").format(format).mode("overwrite").save(path)

  // ------------------------------------------------------ Z-order layout

  /** Multi-column Z-order (Morton) clustering key over integral columns:
    * each column rescales to a `bits`-bit bucket by EXACT long arithmetic
    * `((x − min) · (2ᵇ−1)) div max(1, max − min)` — portable to any ANSI
    * engine's integer division, no double rounding — and the buckets'
    * bits interleave into one long (`bit b of column j → key bit
    * b·ncols + j`).
    *
    * Why it matters at 100 TB: sorting a fact table by ONE column gives
    * parquet min/max pruning on that column only; sorting by the Z-key
    * co-locates rows that are close in EVERY clustering dimension, so a
    * selective filter on any subset of the columns skips most files.
    * The whole fit is one tiny min/max aggregate (broadcast back as
    * plan-time literals) + scan-speed bit arithmetic — the data itself
    * is only touched by [[zorderBy]]'s single range shuffle.
    *
    * NULL in a clustering column yields a NULL key (callers decide the
    * sort placement); column ranges must stay below 2⁴⁷ so the scale
    * product fits a long (enforced). */
  def zorderKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      keyCol: String = "zkey"): DataFrame = {
    require(cols.nonEmpty, "need at least one clustering column")
    require(bits >= 1 && bits <= 16, s"need 1 <= bits <= 16, got $bits")
    require(cols.length * bits <= 62,
      s"ncols*bits = ${cols.length * bits} exceeds the 62-bit key budget")
    val mm = df.agg(
      min(col(cols.head)).cast("long").as("lo0"),
      (max(col(cols.head)).cast("long").as("hi0") +:
        cols.zipWithIndex.tail.flatMap { case (c, i) =>
          Seq(min(col(c)).cast("long").as(s"lo$i"),
            max(col(c)).cast("long").as(s"hi$i"))
        }): _*).head()
    val maxB = (1L << bits) - 1
    val buckets = cols.indices.map { i =>
      require(!mm.isNullAt(2 * i),
        s"column ${cols(i)} has no non-null values to cluster on")
      val lo = mm.getLong(2 * i); val hi = mm.getLong(2 * i + 1)
      require(hi - lo < (1L << 47),
        s"column ${cols(i)} range ${hi - lo} too wide for exact scaling")
      val span = math.max(1L, hi - lo)
      call_function("div",
        (col(cols(i)).cast("long") - lit(lo)) * lit(maxB), lit(span))
    }
    val tmp = buckets.indices.map(i => s"__zb$i")
    val withB = tmp.zip(buckets).foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    val zk = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      tmp.indices.foldLeft(acc) { (a, j) =>
        a + shiftleft(
          call_function("shiftright", col(tmp(j)), lit(b))
            .bitwiseAND(lit(1L)),
          b * tmp.length + j)
      }
    }
    withB.withColumn(keyCol, zk).drop(tmp: _*)
  }

  /** Cluster a table for multi-dimensional scan pruning: compute the
    * Z-key, range-partition on it (one shuffle — Spark samples the key
    * distribution, so skewed dimensions still split evenly) and sort
    * within partitions, so a parquet write of the result carries tight
    * per-file min/max on every clustering column. `numParts <= 0` keeps
    * the session shuffle parallelism. */
  def zorderBy(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      numParts: Int = 0,
      keepKey: Boolean = false): DataFrame = {
    val keyed = zorderKey(df, cols, bits)
    val parts =
      if (numParts > 0) keyed.repartitionByRange(numParts, col("zkey"))
      else keyed.repartitionByRange(col("zkey"))
    val sorted = parts.sortWithinPartitions(col("zkey"))
    if (keepKey) sorted else sorted.drop("zkey")
  }

  /** Materialize the Z-ordered layout on disk — the write half of
    * [[zorderBy]] (same discipline as [[writeShards]]): one range
    * shuffle, one ordered file per partition, every clustering column
    * carrying tight per-file min/max for scan pruning. */
  def zorderWrite(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int = 8,
      numParts: Int = 0,
      format: String = "parquet"): Unit =
    zorderBy(df, cols, bits, numParts)
      .write.format(format).mode("overwrite").save(path)
}
