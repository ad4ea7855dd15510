package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB shape: every variant is a bounded-fanout hash-bucket join — no
  * cartesian products, no driver-side state. Candidate generation shuffles
  * on (band, bucket) keys whose cardinality grows with the corpus, so the
  * plan scales out with executors; verification only touches candidate
  * pairs (LSH guarantees the candidate set is ~linear for bounded
  * similarity thresholds).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-content hash.
    * Equivalent to a hash groupBy — one shuffle on the fingerprint. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__fp")).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")

  /** MinHash signature of the shingle set: k independent permutations
    * approximated by seeded xxhash64; deterministic. */
  def minHashSignature(text: Column, shingleN: Int, k: Int): Column = {
    val sh = TextOps.shingles(text, shingleN)
    // per-seed min over shingle hashes; seeds folded in via concat
    val seeds = sequence(lit(0), lit(k - 1))
    transform(seeds, s =>
      array_min(transform(sh, g => xxhash64(concat(g, lit("#"), s.cast("string"))))))
  }

  /** MinHash + LSH near-dup pairs: signature → b bands of r rows →
    * band-bucket join → exact Jaccard verify on shingle sets.
    *
    * @return (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold
    */
  def minHashPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val k = bands * rows
    val withSig = docs
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("sig", minHashSignature(col("t"), shingleN, k))
      .withColumn("sh", TextOps.shingles(col("t"), shingleN))
      .select("id", "sig", "sh")

    // explode bands: bucket key = hash of the band's signature slice
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(to_json(struct(slice(col("sig"), b * rows + lit(1), lit(rows))))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    cand
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signatures, Hamming ≤ maxDist.
    * Pigeonhole banding: split the signature into maxDist+1 chunks — any
    * pair within maxDist agrees exactly on ≥1 chunk → join per chunk. */
  def simHashPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val sigs = docs.select(col(idCol).as("id"), TextOps.simHash(col(textCol)).as("sig"))

    val banded = sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("chunk"),
          call_function("shiftright", col("sig"), c * bitsPer)
            .bitwiseAND(lit((1L << bitsPer) - 1)).as("key"))))
        .as("ck"))
      .select(col("id"), col("sig"), col("ck.chunk"), col("ck.key"))

    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        TextOps.hamming(col("a.sig"), col("b.sig")).as("dist"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("dist") <= maxDist)
  }

  /** Exact n-gram Jaccard over a candidate blocking key (default: shared
    * fingerprint-band). For small corpora `blockCol = lit(1)` degenerates to
    * all-pairs — only for tests. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val d = docs.select(col(idCol).as("id"),
      TextOps.shingles(col(textCol), n).as("sh"), blockCol.as("blk"))
    val a = d.alias("a"); val b = d.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs via the Similarity LSH path. */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.95): DataFrame =
    Similarity.nearDupPairs(emb, idCol, vecCol, threshold)
}
