package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark side is real — schema, partition-parallel batch iteration,
  * deterministic outputs; the actual media decoding is STUBBED with a
  * deterministic fake (this container has no image/audio codecs). Swap
  * [[decodeStub]] for a real decoder (JNI/FFI or Pandas-UDF equivalent)
  * without touching the plumbing.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      format: String)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      sha: String,
      // decoded feature vector — stub: seeded, deterministic in content
      features: Array[Float],
      frames_sampled: Int,
      resized_w: Int,
      resized_h: Int)

  /** Resize stub: target box fit preserving aspect ratio — the metadata
    * arithmetic is real; a codec-backed version would also rescale pixels. */
  private[graft] def fitBox(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** STUB decode: deterministic 8-dim "feature vector" derived from content
    * bytes. A real implementation would decode pixels/samples here; the
    * batch shape (Iterator per partition → amortized decoder init) is what a
    * codec-backed version needs. */
  private def decodeStub(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 16) % 1000L) / 1000.0f
      d += 1
    }
    out
  }

  /** Frame sampling stub: every nth "frame" (fixed-size byte windows). */
  private def sampleFrames(bytes: Array[Byte], frameSize: Int, everyNth: Int): Int = {
    val frames = math.max(1, bytes.length / math.max(1, frameSize))
    (frames + everyNth - 1) / everyNth
  }

  /** Decode + feature-extract over a media table. mapPartitions keeps the
    * (expensive, in real life) decoder initialization per-partition, and the
    * work scales with input partitioning — repartition upstream to size
    * batches for executor memory. */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int = 4096,
      everyNth: Int = 10, resizeMaxSide: Int = 224): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder/codec once per partition here
      rows.map { r =>
        val (rw, rh) = fitBox(r.width, r.height, resizeMaxSide)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = r.bytes.length,
          sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(r.bytes).map("%02x".format(_)).mkString,
          features = decodeStub(r.bytes),
          frames_sampled =
            if (r.kind == "video") sampleFrames(r.bytes, frameSize, everyNth) else 1,
          resized_w = rw,
          resized_h = rh)
      }
    }
  }

  /** Synthesize a deterministic media table from the documents fixture
    * (text bytes as payload) — exercises the full plumbing on testdata. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaRow(id, kind, bytes, width = 64 + (id % 64).toInt,
        height = 64, format = if (kind == "image") "png" else "raw")
    }
  }

  /** DataFrame-level feature table used by SparkEntry (columnar output,
    * metadata + content hash are oracle-checkable; features are stub-only). */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(syntheticMedia(spark, docs))
      .toDF()
      .withColumn("feat_0", round(element_at(col("features"), 1), 6))
      .drop("features")
}
