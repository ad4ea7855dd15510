package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Decode coverage is real where the JDK carries a codec and honest
  * about the rest:
  *   - IMAGES: [[decodePixels]] decodes PNG/JPEG/GIF/BMP/TIFF/WBMP
  *     pixels via `javax.imageio.ImageIO` (present and functional
  *     headless in a stock JDK — no native library involved);
  *     [[imageFeatures]] turns them into deterministic perceptual
  *     features (aHash/dHash/mean-RGB) in the partition-iterator shape.
  *   - AUDIO: WAV PCM samples decode with plain byte arithmetic
  *     ([[decodeWavPcm]] — RMS/peak/zero-crossings); WAV/FLAC/MP3/MP4
  *     HEADERS probe codec-free ([[probeWav]]/[[probeFlac]]/
  *     [[probeMp3]]/[[probeMp4Duration]]).
  *   - Compressed audio/video CONTENT (MP3/MP4/FLAC sample or frame
  *     decode) genuinely needs codec libraries this container lacks;
  *     those rows fall back to [[contentFingerprint]], a deterministic
  *     content-hash pseudo-embedding that is NOT pixel/sample data and
  *     is documented as such.
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
      // true when `features` came from a REAL content decode (image
      // pixels via ImageIO, WAV PCM samples); false = content-hash
      // fallback (see contentFingerprint)
      decoded: Boolean,
      features: Array[Float],
      frames_sampled: Int,
      resized_w: Int,
      resized_h: Int,
      // audio header metadata (probeWav — real byte inspection); None for
      // non-audio rows and unrecognizable payloads
      channels: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  /** Resize plan: target box fit preserving aspect ratio — the metadata
    * arithmetic a resize stage sizes its output buffers with (pixel
    * rescale itself lives in [[boxDownsample]] for the hash path). */
  private[graft] def fitBox(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** Image format + dimensions from header bytes alone — REAL decoding (no
    * codec library involved): PNG IHDR, JPEG SOFn marker scan, GIF logical
    * screen descriptor, BMP info header. Dimension probing is the genuine
    * first step of an image-curation pipeline — size/aspect filters run on
    * headers so the corpus never pays a full pixel decode for rejects.
    * Returns (format, width, height); None when the payload is not a
    * recognizable image. */
  def probeImage(b: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(18), math.abs(le32(22)))) // negative height = top-down
    else if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      // WebP: one probe per variant — VP8 (lossy) reads the frame tag's
      // start code + 14-bit dims, VP8L (lossless) unpacks the 28-bit
      // dims-minus-one field, VP8X (extended) reads the 24-bit LE canvas
      val tag = new String(b, 12, 4, "US-ASCII")
      tag match {
        case "VP8 " if b.length >= 30 &&
            u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a =>
          Some(("webp", le16(26) & 0x3fff, le16(28) & 0x3fff))
        case "VP8L" if b.length >= 25 && u8(20) == 0x2f =>
          val bits = le32(21)
          Some(("webp", (bits & 0x3fff).toInt + 1, ((bits >> 14) & 0x3fff).toInt + 1))
        case "VP8X" if b.length >= 30 =>
          val w = u8(24) | (u8(25) << 8) | (u8(26) << 16)
          val h = u8(27) | (u8(28) << 8) | (u8(29) << 16)
          Some(("webp", w + 1, h + 1))
        case _ => None
      }
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) != 0xff) return None // desynced — not a well-formed stream
        // consecutive 0xFF bytes are legal fill/padding between segments
        var j = i + 1
        while (j < b.length && u8(j) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = u8(j)
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOFn seen
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i = j + 1 // standalone markers carry no length
        } else if ((marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // be16(j+6) reads through j+7, so j+8 <= length accepts a header
          // truncated right after the width field
          return if (j + 8 <= b.length) Some(("jpeg", be16(j + 6), be16(j + 4))) else None
        } else {
          if (j + 2 >= b.length) return None
          val len = be16(j + 1)
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    } else None
  }

  /** GIF animation facts: frame count, DECLARED duration (sum of the
    * Graphic Control Extension delays; frames without a GCE contribute
    * 0 — renderers clamp tiny delays upward, we report what the file
    * says), and the NETSCAPE2.0 loop count (0 = infinite, None when the
    * extension is absent = play once). */
  case class GifAnim(frames: Int, duration_ms: Long, loops: Option[Int])

  /** Codec-free GIF block walk — the animated-vs-static gate an image
    * curation pipeline runs BEFORE any pixel decode (an "image" column
    * hiding thousand-frame GIFs is a classic poisoned-input shape).
    * Walks the logical screen descriptor, color tables, extension and
    * image-descriptor blocks by their declared lengths without touching
    * LZW content; refuses (None) on unknown block types, truncation
    * before the trailer, or more than `maxFrames` frames — never
    * guesses. */
  def gifAnimation(b: Array[Byte], maxFrames: Int = 100000): Option[GifAnim] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b == null || b.length < 14 || b(0) != 'G' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != '8' || (b(4) != '7' && b(4) != '9') ||
        b(5) != 'a') return None
    var i = 13 // 6-byte header + 7-byte logical screen descriptor
    if ((u8(10) & 0x80) != 0) i += 3 * (1 << ((u8(10) & 7) + 1))
    var frames = 0
    var durMs = 0L
    var loops: Option[Int] = None
    // data sub-blocks: (len, bytes)* then a 0 terminator; returns the
    // position after the terminator, -1 on truncation
    def skipSubBlocks(k0: Int): Int = {
      var k = k0
      while (k < b.length && u8(k) != 0) k += 1 + u8(k)
      if (k >= b.length) -1 else k + 1
    }
    while (i < b.length) {
      u8(i) match {
        case 0x3b => return Some(GifAnim(frames, durMs, loops)) // trailer
        case 0x21 => // extension introducer + label + sub-blocks
          if (i + 1 >= b.length) return None
          val label = u8(i + 1)
          if (label == 0xf9 && i + 7 < b.length && u8(i + 2) == 4)
            durMs += le16(i + 4) * 10L // GCE delay is in 1/100 s
          if (label == 0xff && i + 13 < b.length && u8(i + 2) == 11 &&
              new String(b, i + 3, 11, "US-ASCII") == "NETSCAPE2.0") {
            val k = i + 14
            if (k + 3 < b.length && u8(k) == 3 && u8(k + 1) == 1)
              loops = Some(le16(k + 2))
          }
          val after = skipSubBlocks(i + 2)
          if (after < 0) return None
          i = after
        case 0x2c => // image descriptor (+ local color table + LZW blocks)
          if (i + 10 >= b.length) return None
          frames += 1
          if (frames > maxFrames) return None // loud cap
          val packed = u8(i + 9)
          var k = i + 10
          if ((packed & 0x80) != 0) k += 3 * (1 << ((packed & 7) + 1))
          k += 1 // LZW minimum code size byte
          if (k > b.length) return None
          val after = skipSubBlocks(k)
          if (after < 0) return None
          i = after
        case _ => return None // unknown block type — refuse, never guess
      }
    }
    None // ran off the end without a trailer
  }

  /** GIF animation fixture — hand-placed blocks, every fact a
    * construction literal:
    *   60. 3 frames with GCE delays 5/10/20 cs (→ 350 ms) + NETSCAPE
    *       loop 0 (infinite)
    *   61. single frame, no extensions → (1, 0, no loop ext)
    *   62. truncated before the trailer → refused
    *   63. not a GIF at all. */
  def gifAnimFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hdr = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0x80.toByte, 0, 0) ++ // LSD: 2×2, 2-color GCT
      new Array[Byte](6) // global color table
    def gce(delayCs: Int) = Array[Byte](0x21, 0xf9.toByte, 4, 0,
      (delayCs & 0xff).toByte, ((delayCs >> 8) & 0xff).toByte, 0, 0)
    // descriptor (no local table) + min code size + one 2-byte data block
    val frame = Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2, 2, 1, 1, 0)
    def netscape(loops: Int) =
      Array[Byte](0x21, 0xff.toByte, 11) ++
        "NETSCAPE2.0".getBytes("US-ASCII") ++
        Array[Byte](3, 1, (loops & 0xff).toByte, ((loops >> 8) & 0xff).toByte, 0)
    val trailer = Array[Byte](0x3b)
    val anim = hdr ++ netscape(0) ++ gce(5) ++ frame ++ gce(10) ++ frame ++
      gce(20) ++ frame ++ trailer
    Seq(
      60L -> anim,
      61L -> (hdr ++ frame ++ trailer),
      62L -> (hdr ++ frame), // no trailer
      63L -> "definitely not a gif".getBytes("US-ASCII")
    ).toDF("media_id", "bytes")
  }

  /** Audio header probe, the WAV twin of [[probeImage]] — RIFF/WAVE fmt
    * chunk: (channels, sampleRate, durationMs estimated from the data
    * chunk). Pure byte inspection; duration-based curation filters run
    * without decoding samples. */
  def probeWav(b: Array[Byte]): Option[(Int, Int, Long)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Long)] = None // channels, rate, byteRate
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length)
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le32(i + 16)))
      else if (id == "data") dataLen = len
      // word-aligned advance; a declared length past the buffer end (common
      // for truncated/streamed files, or corrupt) stops the walk — the
      // unvalidated advance could otherwise cycle on crafted lengths
      val adv = len + (len & 1L)
      if (adv > b.length.toLong - i - 8) i = b.length
      else i += 8 + adv.toInt
    }
    fmt.map { case (ch, rate, byteRate) =>
      val ms = if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else -1L
      (ch, rate, ms)
    }
  }

  /** FLAC header probe: STREAMINFO metadata block → (channels, sampleRate,
    * durationMs from the 36-bit total-sample count). Pure byte inspection —
    * the audio twin of [[probeWav]] for the other common lossless
    * container. */
  def probeFlac(b: Array[Byte]): Option[(Int, Int, Long)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return None
    // first metadata block must be STREAMINFO (type 0); 4-byte header
    if ((u8(4) & 0x7f) != 0) return None
    val len = (u8(5) << 16) | (u8(6) << 8) | u8(7)
    if (len < 34 || 8 + 34 > b.length) return None
    val o = 8 + 10 // skip min/max blocksize (4) + min/max framesize (6)
    // 20 bits sample rate | 3 bits channels-1 | 5 bits bps-1 | 36 bits samples
    val rate = (u8(o) << 12) | (u8(o + 1) << 4) | (u8(o + 2) >> 4)
    val ch = ((u8(o + 2) >> 1) & 0x7) + 1
    val samples = ((u8(o + 3) & 0x0fL) << 32) | (u8(o + 4).toLong << 24) |
      (u8(o + 5).toLong << 16) | (u8(o + 6).toLong << 8) | u8(o + 7).toLong
    if (rate <= 0) None
    else Some((ch, rate, if (samples > 0) samples * 1000L / rate else -1L))
  }

  /** CRC-8 (poly x^8+x^2+x+1 = 0x07, init 0) over `[from, until)` —
    * the checksum FLAC frame headers carry; validating it makes a
    * sync-scan frame index reliable without touching entropy-coded
    * content. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** FLAC's UTF-8-style coded number (frame or sample number, up to
    * 36 bits / 7 bytes) at offset `i` → (value, index after), or None
    * on malformed coding. */
  private[graft] def flacCodedNumber(b: Array[Byte], i: Int): Option[(Long, Int)] = {
    @inline def u8(k: Int): Int = b(k) & 0xff
    if (i >= b.length) return None
    val lead = u8(i)
    val extra =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else return None
    if (i + extra >= b.length) return None
    var v: Long = if (extra == 0) lead else lead & (0x7f >> extra)
    var k = 1
    while (k <= extra) {
      val c = u8(i + k)
      if ((c & 0xc0) != 0x80) return None
      v = (v << 6) | (c & 0x3f)
      k += 1
    }
    Some((v, i + extra + 1))
  }

  /** Parsed FLAC frame header: blocking strategy, the coded frame (fixed)
    * or sample (variable) number, block size in samples, sample rate,
    * channels, and total header length including the CRC-8 byte. */
  private[graft] case class FlacHeader(
      variable: Boolean, number: Long, blockSize: Int, rate: Int,
      channels: Int, len: Int)

  /** FLAC frame-header parse at offset `i`, CRC-8-validated; `streamRate`
    * fills the "from STREAMINFO" rate code. None for bad sync, reserved
    * codes, malformed coded numbers, or a CRC mismatch — the checksum is
    * what makes false syncs in entropy-coded content vanishingly
    * unlikely. */
  private[graft] def flacHeaderAt(
      b: Array[Byte], i: Int, streamRate: Int): Option[FlacHeader] = {
    @inline def u8(k: Int): Int = b(k) & 0xff
    if (i < 0 || i + 4 >= b.length) return None
    if (u8(i) != 0xff || (u8(i + 1) & 0xfe) != 0xf8) return None
    val variable = (u8(i + 1) & 1) == 1
    val bsCode = u8(i + 2) >> 4
    val srCode = u8(i + 2) & 0xf
    if (bsCode == 0 || srCode == 15) return None
    val chCode = u8(i + 3) >> 4
    val ssCode = (u8(i + 3) >> 1) & 7
    if (chCode > 10 || ssCode == 3 || (u8(i + 3) & 1) != 0) return None
    val channels = if (chCode < 8) chCode + 1 else 2
    flacCodedNumber(b, i + 4).flatMap { case (num, afterNum) =>
      var j = afterNum
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 =>
          if (j >= b.length) return None
          val v = u8(j) + 1; j += 1; v
        case 7 =>
          if (j + 1 >= b.length) return None
          val v = ((u8(j) << 8) | u8(j + 1)) + 1; j += 2; v
        case c => 256 << (c - 8)
      }
      val rate = srCode match {
        case 0 => streamRate
        case c if c >= 1 && c <= 11 =>
          Array(0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
            32000, 44100, 48000, 96000)(c)
        case 12 =>
          if (j >= b.length) return None
          val v = u8(j) * 1000; j += 1; v
        case 13 =>
          if (j + 1 >= b.length) return None
          val v = (u8(j) << 8) | u8(j + 1); j += 2; v
        case _ => // 14: Hz/10
          if (j + 1 >= b.length) return None
          val v = ((u8(j) << 8) | u8(j + 1)) * 10; j += 2; v
      }
      if (rate <= 0 || j >= b.length) None
      else if (crc8(b, i, j) != u8(j)) None
      else Some(FlacHeader(variable, num, blockSize, rate, channels, j - i + 1))
    }
  }

  /** One FLAC frame-index entry: 1-based frame position in the walk, the
    * header's own coded frame/sample number, block size, sample rate,
    * byte offset/length, start time. */
  case class FlacFrame(
      frame: Int, number: Long, block_size: Int, rate: Int,
      time_ms: Long, offset: Long, size: Long)

  /** Codec-free FLAC frame INDEX — the lossless-audio member of the
    * [[mp4Keyframes]]/[[mp3FrameIndex]] trio. Walks the metadata blocks
    * (reading STREAMINFO's rate for rate-code 0), then SCANS for frame
    * syncs, accepting only headers whose CRC-8 validates — unlike MP3,
    * a FLAC header does not encode its frame's byte length (content is
    * entropy-coded), so frame sizes come from successive validated sync
    * positions and the final frame runs to end-of-stream. Start times
    * accumulate block sizes (exact; the last block of a fixed-blocksize
    * stream is legitimately short). None when the signature or first
    * validated frame is missing; `maxFrames` refuses loudly. */
  def flacFrameIndex(b: Array[Byte], maxFrames: Int = 2000000): Option[Vector[FlacFrame]] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    if (b == null || b.length < 42 || b(0) != 'f' || b(1) != 'L' ||
        b(2) != 'a' || b(3) != 'C') return None
    // metadata block walk; STREAMINFO (type 0) carries the default rate
    var p = 4
    var streamRate = 0
    var last = false
    while (!last) {
      if (p + 4 > b.length) return None
      last = (u8(p) & 0x80) != 0
      val typ = u8(p) & 0x7f
      val len = (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
      if (typ == 0 && len >= 34 && p + 4 + 34 <= b.length) {
        val o = p + 4 + 10
        streamRate = (u8(o) << 12) | (u8(o + 1) << 4) | (u8(o + 2) >> 4)
      }
      if (len > b.length - p - 4) return None
      p += 4 + len
    }
    // sync scan: collect CRC-validated header positions
    val heads = Vector.newBuilder[(Int, FlacHeader)]
    var n = 0
    var i = p
    while (i + 4 < b.length) {
      flacHeaderAt(b, i, streamRate) match {
        case Some(h) =>
          n += 1
          if (n > maxFrames) return None // loud cap
          heads += ((i, h))
          i += h.len // content scan resumes after the header
        case None => i += 1
      }
    }
    val hs = heads.result()
    if (hs.isEmpty) return None
    var samples = 0L
    val out = hs.zipWithIndex.map { case ((off, h), idx) =>
      val end = if (idx + 1 < hs.length) hs(idx + 1)._1 else b.length
      val f = FlacFrame(idx + 1, h.number, h.blockSize, h.rate,
        samples * 1000L / h.rate, off, (end - off).toLong)
      samples += h.blockSize
      f
    }
    Some(out)
  }

  /** Frame indexes over a (id, bytes) audio table — the FLAC twin of
    * [[mp3FramePlan]]; unparseable rows emit a single flagged row. */
  def flacFramePlan(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      maxFrames: Int = 2000000): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (if (bytes == null) None else flacFrameIndex(bytes, maxFrames)) match {
          case Some(fs) => fs.map(f => (id, true, Some(f.frame),
            Some(f.number), Some(f.block_size), Some(f.rate),
            Some(f.time_ms), Some(f.offset), Some(f.size)))
          case None =>
            Seq((id, false, None, None, None, None, None, None, None))
        }
      }
      .toDF(idCol, "flac_ok", "frame", "number", "block_size", "rate",
        "time_ms", "offset", "size")
  }

  /** MP3 frame-header probe: skips a leading ID3v2 tag, finds the first
    * valid frame sync within the next 64 KiB, and reads (channels,
    * sampleRate, durationMs) from the header fields alone — duration is
    * the constant-bitrate estimate `audioBytes * 8 / kbps` (VBR files
    * yield the first-frame-rate estimate; exact VBR length needs a Xing
    * header or full frame walk, deliberately out of header-probe scope).
    * Completes the codec-free audio chain: WAV (RIFF), FLAC (STREAMINFO),
    * MP3 (frame header). */
  def probeMp3(b: Array[Byte]): Option[(Int, Int, Long)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    if (b.length < 4) return None
    var off = 0
    // ID3v2: "ID3" + version(2) + flags(1) + 4-byte syncsafe size
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
        ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
      off = 10 + size
      if (off >= b.length - 4) return None
    }
    val limit = math.min(b.length - 4, off + 65536)
    var i = off
    while (i <= limit && i + 3 < b.length) {
      mp3HeaderAt(b, i) match {
        case Some(h) =>
          // ms = bytes*8 bits / (kbps*1000 bits/s) * 1000 = bytes*8/kbps
          return Some((h.channels, h.rate, (b.length - i).toLong * 8L / h.kbps))
        case None => i += 1
      }
    }
    None
  }

  /** Parsed MPEG audio frame header at a byte offset. */
  private[graft] case class Mp3Header(
      channels: Int, kbps: Int, rate: Int, samples: Int, frameLen: Int)

  /** MPEG-1/2/2.5 Layer I-III frame-header parse at offset `i` — the
    * four header bytes fully determine the frame's byte length (bitrate
    * table + padding slot) and sample count, which is what makes a
    * codec-free frame INDEX possible. None for anything that is not a
    * valid header (bad sync, reserved version/layer, free/invalid
    * bitrate, reserved sample rate). */
  private[graft] def mp3HeaderAt(b: Array[Byte], i: Int): Option[Mp3Header] = {
    @inline def u8(k: Int): Int = b(k) & 0xff
    if (i < 0 || i + 3 >= b.length) return None
    if (u8(i) != 0xff || (u8(i + 1) & 0xe0) != 0xe0) return None
    // bitrate (kbps) tables indexed by the 4-bit header field; 0 = "free"
    // and 15 = invalid are both rejected below
    val v1l1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
    val v1l2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
    val v1l3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val v2l1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
    val v2l23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    val ver = (u8(i + 1) >> 3) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layer = (u8(i + 1) >> 1) & 3 // 1=III, 2=II, 3=I
    val brIdx = (u8(i + 2) >> 4) & 0xf
    val srIdx = (u8(i + 2) >> 2) & 3
    val pad = (u8(i + 2) >> 1) & 1
    if (ver == 1 || layer == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
      return None
    val rate = (ver match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val kbps = (ver, layer) match {
      case (3, 3) => v1l1(brIdx)
      case (3, 2) => v1l2(brIdx)
      case (3, 1) => v1l3(brIdx)
      case (_, 3) => v2l1(brIdx)
      case _      => v2l23(brIdx)
    }
    val ch = if (((u8(i + 3) >> 6) & 3) == 3) 1 else 2
    val samples = layer match {
      case 3 => 384 // Layer I
      case 2 => 1152 // Layer II
      case _ => if (ver == 3) 1152 else 576 // Layer III
    }
    val frameLen = layer match {
      case 3 => (12 * kbps * 1000 / rate + pad) * 4
      case 2 => 144 * kbps * 1000 / rate + pad
      case _ => (if (ver == 3) 144 else 72) * kbps * 1000 / rate + pad
    }
    Some(Mp3Header(ch, kbps, rate, samples, frameLen))
  }

  /** STRONG MP3 evidence for format SNIFFING: a leading ID3v2 tag, or
    * two arithmetically-CONSECUTIVE valid frame headers (the second
    * exactly where the first's length arithmetic lands). A lone header
    * pattern matches random bytes every few KB — [[probeMp3]] alone
    * would label most binary blobs "mp3"; a chained pair is ~2^-30 per
    * offset. Candidates that fail to chain are skipped and the scan
    * continues (a junk prefix before a real stream still sniffs). */
  private[graft] def looksLikeMp3(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4) return false
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') return true
    var i = 0
    val limit = math.min(b.length - 4, 65536)
    while (i <= limit) {
      mp3HeaderAt(b, i) match {
        case Some(h) =>
          val j = i + h.frameLen
          if (h.frameLen > 0 &&
              (j == b.length || mp3HeaderAt(b, j).isDefined)) return true
          i += 1
        case None => i += 1
      }
    }
    false
  }

  /** One entry of an MP3 frame index: 1-based frame number, start time,
    * absolute byte offset/length, and the frame's own bitrate (VBR
    * streams vary it per frame). */
  case class Mp3Frame(
      frame: Int, time_ms: Long, offset: Long, size: Int, kbps: Int)

  /** Codec-free MP3 frame INDEX — the audio twin of [[mp4Keyframes]]:
    * skips an ID3v2 tag, resyncs to the first valid frame header
    * (within the same 64 KiB window as [[probeMp3]]), then walks
    * STRICTLY frame-to-frame (each header's bitrate table + padding bit
    * determines its length exactly, so the next header's position is
    * arithmetic, not search). The walk stops at the first position that
    * is not a valid header, and only COMPLETE frames index — a decode
    * plan must never claim a byte range past the buffer, so trailing
    * junk and truncated tails cost the remainder, never garbage
    * entries; a stream with no complete first frame returns None.
    * `maxFrames` is a loud cap: exceeding it returns None rather than
    * a silently short index. Per-frame times accumulate sample counts
    * (exact under VBR, where byte-proportional estimates drift). */
  def mp3FrameIndex(b: Array[Byte], maxFrames: Int = 2000000): Option[Vector[Mp3Frame]] = {
    if (b == null || b.length < 4) return None
    @inline def u8(i: Int): Int = b(i) & 0xff
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
        ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
      off = 10 + size
      if (off >= b.length - 4) return None
    }
    val limit = math.min(b.length - 4, off + 65536)
    var first = -1
    var i = off
    while (first < 0 && i <= limit) {
      if (mp3HeaderAt(b, i).isDefined) first = i else i += 1
    }
    if (first < 0) return None
    val out = Vector.newBuilder[Mp3Frame]
    var n = 0
    var samples = 0L
    var pos = first
    var h = mp3HeaderAt(b, pos)
    while (h.isDefined) {
      val hd = h.get
      if (hd.frameLen <= 0 || pos + hd.frameLen > b.length) {
        h = None // truncated frame: header present, body cut — not indexed
      } else {
        if (n >= maxFrames) return None // loud cap, never a short index
        n += 1
        out += Mp3Frame(n, samples * 1000L / hd.rate, pos, hd.frameLen, hd.kbps)
        samples += hd.samples
        pos += hd.frameLen
        h = mp3HeaderAt(b, pos)
      }
    }
    val fs = out.result()
    if (fs.isEmpty) None else Some(fs)
  }

  /** Frame indexes over a (id, bytes) audio table — (idCol, mp3_ok,
    * frame, time_ms, offset, size, kbps), one row per frame,
    * partition-iterator shape; unparseable rows emit a single flagged
    * row (same routing contract as the other media decoders). */
  def mp3FramePlan(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      maxFrames: Int = 2000000): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (if (bytes == null) None else mp3FrameIndex(bytes, maxFrames)) match {
          case Some(fs) => fs.map(f => (id, true, Some(f.frame),
            Some(f.time_ms), Some(f.offset), Some(f.size), Some(f.kbps)))
          case None => Seq((id, false, None, None, None, None, None))
        }
      }
      .toDF(idCol, "mp3_ok", "frame", "time_ms", "offset", "size", "kbps")
  }

  /** MP4/ISO-BMFF duration probe: walks top-level boxes to `moov`, then its
    * children to `mvhd`, and returns duration in ms from the movie header's
    * timescale/duration fields (v0 and v1 layouts). Header-only — a video
    * length filter runs without touching a single codec frame. */
  /** ISO-BMFF box iterator over `b[lo, hi)`: (type, payloadStart,
    * payloadEnd); 64-bit and to-end sizes handled, malformed sizes
    * terminate the walk at `hi` instead of reading past it. */
  private def mp4Boxes(b: Array[Byte])(lo: Int, hi: Int): Iterator[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)).toLong & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val sz0 = be32(i)
        val typ = new String(b, i + 4, 4, "US-ASCII")
        val (payload, size) =
          if (sz0 == 1L && i + 16 <= hi) (i + 16, be64(i + 8))
          else (i + 8, if (sz0 == 0L) (hi - i).toLong else sz0)
        val end = if (size < 8 || size > hi.toLong - i) hi else (i + size).toInt
        val out = (typ, payload, end)
        i = end
        out
      }
    }
  }

  def probeMp4Duration(b: Array[Byte]): Option[Long] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)).toLong & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] = mp4Boxes(b)(lo, hi)
    if (b.length < 12) return None
    val top = boxes(0, b.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    top.collectFirst { case ("moov", s, e) => (s, e) }.flatMap { case (s, e) =>
      boxes(s, e).collectFirst { case ("mvhd", ms, me) => (ms, me) }.flatMap {
        case (ms, me) =>
          if (ms >= me) None
          else u8(ms) match { // version byte
            case 0 if ms + 20 <= me =>
              val timescale = be32(ms + 12); val dur = be32(ms + 16)
              if (timescale > 0) Some(dur * 1000L / timescale) else None
            case 1 if ms + 32 <= me =>
              val timescale = be32(ms + 20); val dur = be64(ms + 24)
              if (timescale > 0) Some(dur * 1000L / timescale) else None
            case _ => None
          }
      }
    }
  }

  /** One entry of an MP4 keyframe decode plan: 1-based sample number,
    * presentation-order start time, absolute file offset and byte size —
    * everything a downstream (GPU-side) frame decoder needs to read
    * EXACTLY the keyframes, nothing else. */
  case class Mp4Keyframe(sample: Int, time_ms: Long, offset: Long, size: Long)

  /** MP4/ISO-BMFF keyframe PLAN extraction — pure sample-table byte
    * arithmetic, no codec: finds the first `vide`-handler track, reads
    * mdhd's timescale and the stbl tables (stts decode deltas, stsz
    * sizes, stsc sample→chunk mapping, stco/co64 chunk offsets, stss
    * sync-sample numbers), and emits one [[Mp4Keyframe]] per sync
    * sample. Per the spec, a MISSING stss box means every sample is a
    * sync sample — all samples are emitted then. Frame CONTENT decode
    * genuinely needs codecs this container lacks; the plan (which byte
    * ranges to hand a decoder) is the Spark-side deliverable, and at
    * 100 TB it's what you want anyway: ship (offset, size) lists to the
    * decode fleet instead of re-scanning containers there.
    *
    * Crawled bytes are adversarial: every table read is bounds-checked
    * and any structural inconsistency (table past its box, sample
    * numbers past stsz, chunk index past stco) returns None rather than
    * partial garbage. `maxSamples` bounds the emitted plan (a crafted
    * stts/stsz sample_count must not allocate unbounded rows) — an
    * explicit, caller-visible cap, truncation NEVER silent: hitting it
    * also returns None (a >maxSamples-keyframe file needs a bigger cap,
    * not a quietly short plan). */
  def mp4Keyframes(b: Array[Byte], maxSamples: Int = 100000): Option[Vector[Mp4Keyframe]] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)).toLong & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxes(lo: Int, hi: Int) = mp4Boxes(b)(lo, hi)
    if (b.length < 12) return None
    val top = boxes(0, b.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }.getOrElse(return None)

    // first trak whose mdia/hdlr handler is 'vide'
    val videoMdia = boxes(moov._1, moov._2).collect { case ("trak", ts, te) =>
      boxes(ts, te).collectFirst { case ("mdia", ms, me) => (ms, me) }
    }.flatten.find { case (ms, me) =>
      boxes(ms, me).exists { case ("hdlr", hs, he) =>
        hs + 12 <= he && new String(b, hs + 8, 4, "US-ASCII") == "vide"
      case _ => false }
    }.getOrElse(return None)
    val (ms, me) = videoMdia

    val timescale = boxes(ms, me).collectFirst { case ("mdhd", hs, he) =>
      u8(hs) match {
        case 0 if hs + 16 <= he => be32(hs + 12)
        case 1 if hs + 24 <= he => be32(hs + 20)
        case _                  => 0L
      }
    }.filter(_ > 0).getOrElse(return None)

    val stbl = boxes(ms, me).collectFirst { case ("minf", fs, fe) =>
      boxes(fs, fe).collectFirst { case ("stbl", ss, se) => (ss, se) }
    }.flatten.getOrElse(return None)
    def table(typ: String): Option[(Int, Int)] =
      boxes(stbl._1, stbl._2).collectFirst { case (`typ`, s, e) => (s, e) }

    // stsz: uniform size or per-sample table; sample count is the
    // authoritative n
    val (sizeOf, nSamples) = table("stsz") match {
      case Some((s, e)) if s + 12 <= e =>
        val uniform = be32(s + 4)
        val n = be32(s + 8)
        if (n > maxSamples) return None
        val ni = n.toInt
        if (uniform != 0L) ((_: Int) => uniform, ni)
        else if (s + 12 + 4L * ni <= e)
          ((k: Int) => be32(s + 12 + 4 * (k - 1)), ni) // k is 1-based
        else return None
      case _ => return None
    }
    if (nSamples == 0) return Some(Vector.empty)

    // stts: (count, delta) runs → start time of each sample
    val sttsRuns: Vector[(Long, Long)] = table("stts") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = be32(s + 4)
        if (s + 8 + 8L * n > e) return None
        (0 until n.toInt).map(i =>
          (be32(s + 8 + 8 * i), be32(s + 12 + 8 * i))).toVector
      case _ => return None
    }
    if (sttsRuns.map(_._1).sum < nSamples) return None

    // stsc: (first_chunk, samples_per_chunk) runs
    val stscRuns: Vector[(Long, Long)] = table("stsc") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = be32(s + 4)
        if (n == 0L || s + 8 + 12L * n > e) return None
        (0 until n.toInt).map(i =>
          (be32(s + 8 + 12 * i), be32(s + 12 + 12 * i))).toVector
      case _ => return None
    }
    if (stscRuns.head._1 != 1L || stscRuns.exists(_._2 == 0L) ||
        stscRuns.sliding(2).exists { case Vector((a, _), (b2, _)) => b2 <= a
          case _ => false }) return None

    // chunk offsets: stco (32-bit) or co64
    val chunkOffset: Int => Option[Long] = table("stco") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = be32(s + 4)
        if (s + 8 + 4L * n > e) return None
        (c: Int) => if (c >= 1 && c <= n) Some(be32(s + 8 + 4 * (c - 1))) else None
      case _ => table("co64") match {
        case Some((s, e)) if s + 8 <= e =>
          val n = be32(s + 4)
          if (s + 8 + 8L * n > e) return None
          (c: Int) => if (c >= 1 && c <= n) Some(be64(s + 8 + 8 * (c - 1))) else None
        case _ => return None
      }
    }

    // stss: 1-based sync sample numbers; ABSENT = every sample syncs
    val sync: Option[Set[Int]] = table("stss") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = be32(s + 4)
        if (s + 8 + 4L * n > e) return None
        Some((0 until n.toInt).map(i => be32(s + 8 + 4 * i).toInt).toSet)
      case Some(_) => return None
      case None    => None
    }

    // one ordered pass over samples 1..n, carrying the stts cursor and
    // the chunk geometry (stsc run, chunk number, intra-chunk position)
    val out = Vector.newBuilder[Mp4Keyframe]
    var time = 0L
    var run = 0; var runLeft = sttsRuns.head._1
    var scRun = 0
    var chunk = 1L
    var inChunk = 0L // samples already placed in the current chunk
    var chunkBase = chunkOffset(1).getOrElse(return None)
    var k = 1
    while (k <= nSamples) {
      // advance chunk geometry when the current chunk is full
      val spc = stscRuns(scRun)._2
      if (inChunk == spc) {
        chunk += 1
        if (scRun + 1 < stscRuns.length && chunk >= stscRuns(scRun + 1)._1)
          scRun += 1
        inChunk = 0
        chunkBase = chunkOffset(chunk.toInt).getOrElse(return None)
      }
      if (sync.forall(_.contains(k)))
        out += Mp4Keyframe(k, time * 1000L / timescale, chunkBase, sizeOf(k))
      chunkBase += sizeOf(k)
      inChunk += 1
      // advance decode time (zero-count runs skip; the sum>=n guard
      // above ensures a positive run always remains)
      while (runLeft == 0L) { run += 1; runLeft = sttsRuns(run)._1 }
      time += sttsRuns(run)._2
      runLeft -= 1
      k += 1
    }
    Some(out.result())
  }

  /** Keyframe decode plans over a (id, bytes) media table —
    * (idCol, mp4_ok, sample, time_ms, offset, size), one row per sync
    * sample, partition-iterator shape; rows that aren't parseable MP4
    * video emit a single flagged row with NULL plan fields (same
    * routing contract as the other media decoders). */
  def mp4KeyframePlan(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      maxSamples: Int = 100000): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (if (bytes == null) None else mp4Keyframes(bytes, maxSamples)) match {
          case Some(ks) => ks.map(f => (id, true,
            Some(f.sample), Some(f.time_ms), Some(f.offset), Some(f.size)))
          case None => Seq((id, false, None, None, None, None))
        }
      }
      .toDF(idCol, "mp4_ok", "sample", "time_ms", "offset", "size")
  }

  /** EXIF metadata extracted by [[probeExif]]: display orientation
    * (EXIF tag 0x0112, 1–8), capture timestamp ("YYYY:MM:DD HH:MM:SS",
    * DateTimeOriginal preferred over file DateTime), and whether a GPS
    * IFD is present — the provenance/PII signal an image-curation gate
    * wants BEFORE any pixel decode (GPS-bearing images need redaction
    * review; orientation feeds the resize plan; capture time feeds
    * dedup/freshness). */
  case class ExifInfo(
      orientation: Option[Int],
      captured_at: Option[String],
      has_gps: Boolean)

  /** EXIF/TIFF metadata byte-probe — the provenance twin of
    * [[probeImage]], pure byte inspection (no codec): accepts a
    * standalone TIFF payload (`II*\0` / `MM\0*`) or a JPEG whose APP1
    * segment carries `Exif\0\0` + TIFF, walks IFD0 for Orientation
    * (0x0112), DateTime (0x0132) and the GPS IFD pointer (0x8825), and
    * follows the Exif sub-IFD pointer (0x8769) for DateTimeOriginal
    * (0x9003). Returns None when no readable TIFF structure exists
    * (non-exif JPEG, corrupt header, IFD offset past the buffer);
    * individually-corrupt IFD entries are skipped, not fatal. Every
    * read is bounds-checked — crawled image bytes are adversarial
    * input, and a crafted offset must cost a null, not a task. */
  def probeExif(b: Array[Byte]): Option[ExifInfo] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    // TIFF base: standalone payload, or inside a JPEG APP1 Exif segment
    def tiffBase: Option[Int] =
      if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && u8(2) == 0 && u8(3) == 42))) Some(0)
      else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        var i = 2
        while (i + 3 < b.length) {
          if (u8(i) != 0xff) return None // desynced
          var j = i + 1
          while (j < b.length && u8(j) == 0xff) j += 1
          if (j + 2 >= b.length) return None
          val marker = u8(j)
          if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
            i = j + 1
          } else {
            val len = be16(j + 1)
            if (len < 2 || j + 1 + len > b.length) return None
            if (marker == 0xe1 && len >= 8 + 2 &&
                b(j + 3) == 'E' && b(j + 4) == 'x' && b(j + 5) == 'i' &&
                b(j + 6) == 'f' && u8(j + 7) == 0 && u8(j + 8) == 0)
              return Some(j + 9)
            i = j + 1 + len
          }
        }
        None
      } else None
    tiffBase.flatMap { base =>
      if (base + 8 > b.length) return None
      val le = b(base) == 'I'
      @inline def r16(i: Int): Int =
        if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
      @inline def r32(i: Int): Long = {
        val v = if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
            (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
          else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
            (u8(i + 2).toLong << 8) | u8(i + 3).toLong
        v & 0xffffffffL
      }
      // each yielded (tag, type, count, valueFieldOffset); a count/offset
      // walking out of the buffer ends or skips cleanly
      def entries(ifdOfs: Long): Seq[(Int, Int, Long, Int)] = {
        val at = base + ifdOfs
        if (ifdOfs <= 0 || at + 2 > b.length) return Nil
        val n = r16(at.toInt)
        (0 until n).flatMap { k =>
          val e = at.toInt + 2 + 12 * k
          if (e + 12 > b.length) None
          else Some((r16(e), r16(e + 2), r32(e + 4), e + 8))
        }
      }
      def ascii(count: Long, valOfs: Int): Option[String] = {
        if (count <= 0 || count > 4096) return None
        val start = if (count <= 4) valOfs else base + r32(valOfs).toInt
        if (start < 0 || start + count > b.length) return None
        val s = new String(b, start, count.toInt, "US-ASCII")
        val t = s.takeWhile(_ != '\u0000').trim
        if (t.isEmpty) None else Some(t)
      }
      val ifd0 = entries(r32(base + 4))
      if (ifd0.isEmpty) return None
      val orientation = ifd0.collectFirst {
        case (0x0112, 3, 1, v) => r16(v)
      }.filter(o => o >= 1 && o <= 8)
      val dateTime = ifd0.collectFirst {
        case (0x0132, 2, n, v) => ascii(n, v)
      }.flatten
      val hasGps = ifd0.exists(_._1 == 0x8825)
      val original = ifd0.collectFirst { case (0x8769, 4, 1, v) => r32(v) }
        .toSeq.flatMap(entries)
        .collectFirst { case (0x9003, 2, n, v) => ascii(n, v) }.flatten
      Some(ExifInfo(orientation, original.orElse(dateTime), hasGps))
    }
  }

  /** Deterministic EXIF fixture: hand-built literal byte payloads (both
    * endiannesses, JPEG-wrapped and standalone TIFF, GPS-bearing,
    * corrupt-IFD, exif-less) so [[probeExif]]'s decisions are
    * hand-computable by an external oracle. Output: (media_id, exif_ok,
    * orientation, captured_at, has_gps). */
  def exifFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    exifBytesFixture(spark).as[(Long, Array[Byte])].map { case (id, bs) =>
      val e = probeExif(bs)
      (id, e.isDefined, e.flatMap(_.orientation), e.flatMap(_.captured_at),
        e.exists(_.has_gps))
    }.toDF("media_id", "exif_ok", "orientation", "captured_at", "has_gps")
  }

  /** Raw (media_id, bytes) rows of [[exifFixture]] — the same six
    * constructions before probing, for dialect-scalar oracle queries. */
  def exifBytesFixture(spark: SparkSession): DataFrame = {
    def tiff(le: Boolean, orientation: Option[Int], dateTime: Option[String],
        dateTimeOriginal: Option[String], gps: Boolean): Array[Byte] = {
      val n0 = orientation.size + dateTime.size +
        dateTimeOriginal.size + (if (gps) 1 else 0)
      val ifd0Size = 2 + 12 * n0 + 4
      var cursor = 8 + ifd0Size
      val ofsDT = cursor; if (dateTime.isDefined) cursor += 20
      val ofsExif = cursor; if (dateTimeOriginal.isDefined) cursor += 2 + 12 + 4
      val ofsDTO = cursor; if (dateTimeOriginal.isDefined) cursor += 20
      val ofsGps = cursor; if (gps) cursor += 6
      val buf = java.nio.ByteBuffer.allocate(cursor).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
      buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
      buf.putShort(42); buf.putInt(8)
      buf.putShort(n0.toShort) // IFD0, entries tag-sorted
      def entry(tag: Int, typ: Int, count: Int, value: Int, short: Boolean): Unit = {
        buf.putShort(tag.toShort); buf.putShort(typ.toShort); buf.putInt(count)
        if (short) { buf.putShort(value.toShort); buf.putShort(0) }
        else buf.putInt(value)
      }
      orientation.foreach(o => entry(0x0112, 3, 1, o, short = true))
      dateTime.foreach(_ => entry(0x0132, 2, 20, ofsDT, short = false))
      dateTimeOriginal.foreach(_ => entry(0x8769, 4, 1, ofsExif, short = false))
      if (gps) entry(0x8825, 4, 1, ofsGps, short = false)
      buf.putInt(0) // next-IFD
      def asciiField(s: String): Unit = {
        val padded = (s + "\u0000").getBytes("US-ASCII").padTo(20, 0.toByte)
        buf.put(padded, 0, 20)
      }
      dateTime.foreach(asciiField)
      dateTimeOriginal.foreach { s =>
        buf.putShort(1); entry(0x9003, 2, 20, ofsDTO, short = false)
        buf.putInt(0); asciiField(s)
      }
      if (gps) { buf.putShort(0); buf.putInt(0) }
      buf.array()
    }
    def jpegWrap(t: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(4 + 4 + 6 + t.length + 2)
      buf.put(Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte))
      buf.putShort((2 + 6 + t.length).toShort)
      buf.put("Exif".getBytes("US-ASCII")); buf.put(0.toByte); buf.put(0.toByte)
      buf.put(t); buf.put(0xff.toByte); buf.put(0xd9.toByte)
      buf.array()
    }
    // valid header, IFD0 offset far past the buffer — the adversarial row
    val corrupt = Array[Byte]('I', 'I', 42, 0, -1, -1, -1, 0x7f)
    val plainJpeg = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    val rows = Seq(
      1L -> jpegWrap(tiff(le = true, Some(6), Some("2024:01:02 03:04:05"),
        Some("2023:12:31 23:59:58"), gps = true)),
      2L -> tiff(le = false, Some(1), Some("2024:05:06 07:08:09"), None,
        gps = false),
      3L -> corrupt,
      4L -> plainJpeg,
      5L -> jpegWrap(tiff(le = true, Some(3), None, None, gps = false)),
      6L -> tiff(le = true, None, None, None, gps = true))
    import spark.implicits._
    rows.toDF("media_id", "bytes")
  }

  // ------------------------------------------------------ pixel decode (real)

  /** Decode image pixels via the JDK's ImageIO (PNG/JPEG/GIF/BMP/TIFF/
    * WBMP readers ship with the JDK and run headless). Crawled bytes are
    * adversarial input: any decoder error costs a None, never a task.
    * `ImageIO.read` returns null for unrecognized formats (e.g. WebP —
    * no JDK reader) — also None. */
  def decodePixels(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Throwable => None }

  /** Decoded pixel grids: one `getRGB` pass yields the ARGB buffer AND
    * the integer luma grid — per pixel `(77·R + 150·G + 29·B) >> 8`
    * (the classic integer BT.601 approximation — EXACT integer
    * arithmetic, so every downstream feature is bit-deterministic and
    * hand-computable; R=G=B=v maps to exactly v). One buffer read per
    * image: the decode path is the hot loop of an image-curation scan,
    * and a second getRGB would double its largest allocation. */
  private[graft] case class PixelGrids(
      w: Int, h: Int, argb: Array[Int], luma: Array[Int])

  private[graft] def pixelGrids(img: java.awt.image.BufferedImage): PixelGrids = {
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i) = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
        29 * (p & 0xff)) >> 8
      i += 1
    }
    PixelGrids(w, h, px, out)
  }

  private[graft] def lumaGrid(img: java.awt.image.BufferedImage): (Int, Int, Array[Int]) = {
    val g = pixelGrids(img)
    (g.w, g.h, g.luma)
  }

  /** Deterministic box-filter downsample of a luma grid to `tw`×`th`:
    * target cell (ty, tx) averages the source box with integer-floor
    * boundaries `[ty·h/th, (ty+1)·h/th) × [tx·w/tw, (tx+1)·w/tw)` (each
    * box at least one pixel). Exact block means when the source divides
    * evenly — this repo's pinned spec, NOT `Image.getScaledInstance`
    * (whose kernel is platform-discretionary and would make hashes
    * non-portable). */
  private[graft] def boxDownsample(
      w: Int, h: Int, luma: Array[Int], tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(y * w + x); n += 1; x += 1 }
          y += 1
        }
        out(ty * tw + tx) = s.toDouble / n
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Average hash: 8×8 luma downsample, bit `y·8+x` set iff the cell is
    * STRICTLY above the 64-cell mean (a uniform image hashes to 0L —
    * pinned convention). The standard perceptual near-dup signature
    * (aHash family popularized by Krawetz's "Looks Like It", 2011;
    * the bit layout and strict-comparison convention here are this
    * repo's own pinned spec): Hamming distance ≤ 3 ≈ same image up to
    * recompression/resize. */
  private[graft] def aHash64(w: Int, h: Int, luma: Array[Int]): Long = {
    val g = boxDownsample(w, h, luma, 8, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (g(i) > mean) bits |= 1L << i; i += 1 }
    bits
  }

  /** Difference hash: 9×8 luma downsample, bit `y·8+x` set iff cell
    * (y, x+1) is strictly brighter than (y, x) — gradient-based, robust
    * to global brightness shifts where aHash is not (dHash per
    * Krawetz 2013; grid mapping and strict comparison are this repo's
    * pinned spec). */
  private[graft] def dHash64(w: Int, h: Int, luma: Array[Int]): Long = {
    val g = boxDownsample(w, h, luma, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Perceptual DCT hash (pHash, the DCT scheme described by Zauner,
    * "Implementation and Benchmarking of Perceptual Image Hash
    * Functions", 2010 — re-specified here exactly; no code consulted):
    * 32×32 luma downsample ([[boxDownsample]]
    * spec), orthonormal 2D DCT-II, the top-left 8×8 coefficient block,
    * bit `v·8+u` set iff the coefficient is STRICTLY above the median of
    * the 63 AC coefficients (DC is excluded from the median and its bit
    * 0 is always 0 — pinned convention; a uniform image hashes to 0L).
    * Coefficients are quantized to 6 decimal places (half-even) BEFORE
    * the median/compare — the repo's plan-literal convention: it zeroes
    * the ~1e-9 FP residue a brightness shift leaks into mathematically
    * zero coefficients (whose exact-tie crowd otherwise sits right at
    * the median on structured images) and makes the hash identical
    * across any implementation of this spec regardless of summation
    * order.
    * Captures low-frequency structure, so it survives recompression,
    * mild blur and resizing where aHash flips; invariances that follow
    * from the algebra (and are spec-pinned): constant brightness shifts
    * touch only the DC (hash unchanged), positive contrast scaling
    * multiplies every AC coefficient and the median together (hash
    * unchanged). Same 64-bit shape as aHash/SimHash — the banding
    * machinery applies unchanged. */
  private[graft] def pHash64(w: Int, h: Int, luma: Array[Int]): Long = {
    val g = boxDownsample(w, h, luma, 32, 32)
    // cos((2x+1)·u·π/64) for u in 0..7, x in 0..31
    val cosT = Array.tabulate(8, 32)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 64.0))
    // separable DCT: rows first (only the 8 needed u per row), then cols
    val rowPass = Array.ofDim[Double](32, 8)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * cosT(u)(x); x += 1 }
        rowPass(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Double](8, 8)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rowPass(yy)(u) * cosT(v)(yy); yy += 1 }
        val au = if (u == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
        val av = if (v == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
        coef(v)(u) = math.rint(au * av * s * 1e6) / 1e6
        u += 1
      }
      v += 1
    }
    val ac = new Array[Double](63)
    var k = 0
    v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if (u != 0 || v != 0) { ac(k) = coef(v)(u); k += 1 }
        u += 1
      }
      v += 1
    }
    java.util.Arrays.sort(ac)
    val median = ac(31) // 63 values: index 31 is the exact middle
    var bits = 0L
    v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if ((u != 0 || v != 0) && coef(v)(u) > median)
          bits |= 1L << (v * 8 + u)
        u += 1
      }
      v += 1
    }
    bits
  }

  /** Real pixel features over a (id, bytes) media table — the decoded
    * twin of the header probes: per row `decode_ok`, header `format`
    * ([[probeImage]]), decoded `width`/`height`, perceptual `ahash`/
    * `dhash`, channel means and mean luma. mapPartitions keeps decoder
    * state per-partition (ImageIO's disk cache is disabled once per
    * partition — a temp-file per decode would be the scale killer);
    * work scales with input partitioning, zero shuffle. Undecodable
    * rows (corrupt bytes, codec-less formats like WebP) emit
    * decode_ok=false with NULL features — a crafted payload costs a
    * row, never a task. Pair with
    * [[graft.operators.Dedup.simHashPairsFromSignatures]] over `ahash`
    * for perceptual near-dup pairs (the image twin of SimHash text
    * dedup). */
  def imageFeatures(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        rows.map { case (id, bytes) =>
          val fmt = if (bytes == null) None else probeImage(bytes).map(_._1)
          (if (bytes == null) None else decodePixels(bytes)) match {
            case Some(img) =>
              val g = pixelGrids(img)
              var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
              var i = 0
              while (i < g.argb.length) {
                val p = g.argb(i)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                sl += g.luma(i)
                i += 1
              }
              val n = g.argb.length.toDouble
              (id, true, fmt, Some(g.w), Some(g.h),
                Some(aHash64(g.w, g.h, g.luma)), Some(dHash64(g.w, g.h, g.luma)),
                Some(sr / n), Some(sg / n), Some(sb / n), Some(sl / n),
                Some(pHash64(g.w, g.h, g.luma)))
            case None =>
              (id, false, fmt, None, None, None, None, None, None, None, None,
                None)
          }
        }
      }
      .toDF(idCol, "decode_ok", "format", "width", "height", "ahash",
        "dhash", "mean_r", "mean_g", "mean_b", "gray_mean", "phash")
  }

  /** Materialized thumbnail: the decoded image's luma grid box-resampled
    * to `tw`×`th` ([[boxDownsample]]'s pinned integer-floor spec — the
    * same kernel the hashes use, so a thumbnail IS the hash's input and
    * the two can never drift). Output rows: (idCol, decode_ok, thumb)
    * with `thumb` a row-major tw·th double array (NULL when
    * undecodable). The resize stage of an image-curation pipeline in
    * partition-iterator shape — decode once, emit the model-input-sized
    * grid, never ship original pixels downstream. */
  def imageThumbnail(
      media: DataFrame,
      tw: Int,
      th: Int,
      bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    require(tw > 0 && th > 0, "thumbnail dims must be positive")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          (if (bytes == null) None else decodePixels(bytes)) match {
            case Some(img) =>
              val g = pixelGrids(img)
              (id, true, Some(boxDownsample(g.w, g.h, g.luma, tw, th)))
            case None => (id, false, None)
          }
        }
      }
      .toDF(idCol, "decode_ok", "thumb")
  }

  // ------------------------------------------------------ PCM decode (real)

  /** Decoded WAV PCM sample statistics: frame count, exact duration,
    * and channel-0 RMS / peak / zero-crossing count. */
  case class PcmStats(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationMs: Long,
      rms: Double,
      peak: Int,
      zeroCrossings: Long)

  /** Decode WAV PCM SAMPLES (not just the header): RIFF chunk walk to
    * `fmt `/`data`, then 16-bit signed LE or 8-bit unsigned (centered
    * at 128) samples — pure byte arithmetic, no codec. Channel-0
    * statistics: RMS = sqrt(mean(s²)), peak = max |s|, zero crossings =
    * count of consecutive channel-0 samples whose signs differ (s < 0
    * vs s ≥ 0 — pinned convention). Returns None for non-RIFF payloads,
    * non-PCM encodings (compressed WAV), other bit depths, or a missing
    * data chunk; a declared data length past the buffer clamps to the
    * available bytes (truncated uploads are data, not errors). */
  def decodeWavPcm(b: Array[Byte]): Option[PcmStats] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    wavPcmLayout(b) match {
      case Some((ch, rate, bits, dataOff, nFrames)) =>
        val bytesPerFrame = ch * bits / 8
        var sumSq = 0.0
        var peak = 0
        var zc = 0L
        var prevNeg = false
        var f = 0L
        while (f < nFrames) {
          val o = dataOff + (f * bytesPerFrame).toInt // channel 0 sample
          val s =
            if (bits == 16) (le16(o) << 16) >> 16 // sign-extend
            else u8(o) - 128
          sumSq += s.toDouble * s
          if (math.abs(s) > peak) peak = math.abs(s)
          val neg = s < 0
          if (f > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          f += 1
        }
        Some(PcmStats(ch, rate, bits, nFrames,
          nFrames * 1000L / rate,
          if (nFrames > 0) math.sqrt(sumSq / nFrames) else 0.0,
          peak, zc))
      case None => None
    }
  }

  /** RIFF/fmt/data chunk walk shared by the PCM decoders:
    * (channels, rate, bits, dataOffset, nFrames) for integer-PCM WAVs
    * (16-bit signed / 8-bit unsigned), None for anything else. A
    * declared data length past the buffer clamps to the available bytes
    * (truncated uploads are data, not errors). */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // audioFormat, ch, rate, bits
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length)
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      else if (id == "data") { dataOff = i + 8; dataLen = len }
      val adv = len + (len & 1L)
      if (adv > b.length.toLong - i - 8) i = b.length
      else i += 8 + adv.toInt
    }
    fmt match {
      case Some((1, ch, rate, bits)) if (bits == 16 || bits == 8) &&
          ch >= 1 && rate > 0 && dataOff >= 0 =>
        val avail = math.min(dataLen, (b.length - dataOff).toLong)
        val bytesPerFrame = ch * bits / 8
        val nFrames = if (bytesPerFrame > 0) avail / bytesPerFrame else 0L
        Some((ch, rate, bits, dataOff, nFrames))
      case _ => None
    }
  }

  /** Channel-0 samples of an integer-PCM WAV as signed ints, with the
    * sample rate — the raw-material form for waveform-level signatures
    * ([[envHash64]]). Same accept/refuse contract as [[decodeWavPcm]]. */
  def decodeWavChannel0(b: Array[Byte]): Option[(Int, Array[Int])] =
    wavPcmLayout(b).map { case (ch, rate, bits, dataOff, nFrames) =>
      @inline def u8(i: Int): Int = b(i) & 0xff
      @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val bytesPerFrame = ch * bits / 8
      val n = math.min(nFrames, Int.MaxValue.toLong).toInt
      val out = new Array[Int](n)
      var f = 0
      while (f < n) {
        val o = dataOff + f * bytesPerFrame
        out(f) = if (bits == 16) (le16(o) << 16) >> 16 else u8(o) - 128
        f += 1
      }
      (rate, out)
    }

  /** 64-bucket waveform-envelope hash — the audio member of the
    * perceptual-signature family (aHash's construction applied to the
    * |sample| sequence): channel-0 |samples| mean-pool into 64 buckets
    * with the SAME integer-floor boundary spec as [[boxDownsample]]
    * (bucket i covers sample index [i·n/64, (i+1)·n/64), at least one
    * sample), and bit i is set iff bucket i's mean is STRICTLY above
    * the mean of the 64 bucket means (an amplitude-constant clip hashes
    * to 0L — pinned convention, same as aHash's uniform image).
    *
    * Invariances (exact, by construction): positive amplitude scaling
    * (all buckets and their mean scale together; strict comparison
    * preserved) and sample-duplication resampling (each bucket's time
    * fraction is unchanged). NOT time-shift invariant — this signature
    * catches re-encoded/resampled/regained COPIES, not clipped excerpts
    * (the same contract as the image hashes, which don't survive
    * cropping). Pair with
    * [[graft.operators.Dedup.simHashPairsFromSignatures]] for audio
    * near-dup candidate pairs at a Hamming threshold. */
  private[graft] def envHash64(samples: Array[Int]): Long = {
    if (samples.length == 0) return 0L
    val abs = new Array[Int](samples.length)
    var i = 0
    while (i < samples.length) {
      abs(i) = math.abs(samples(i)); i += 1
    }
    val env = boxDownsample(samples.length, 1, abs, 64, 1)
    var mean = 0.0
    var k = 0
    while (k < 64) { mean += env(k); k += 1 }
    mean /= 64.0
    var bits = 0L
    k = 0
    while (k < 64) {
      if (env(k) > mean) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** [[envHash64]] over a WAV payload: None for non-PCM bytes. */
  def wavEnvelopeHash(b: Array[Byte]): Option[Long] =
    decodeWavChannel0(b).map { case (_, s) => envHash64(s) }

  /** One energy segment: 1-based index, window-granular span, how much
    * of it was ACTIVE, and the RMS over the active windows only (so a
    * constant-amplitude tone reads its exact amplitude regardless of
    * bridged silence). */
  case class WavSegment(
      segment: Int, start_ms: Long, end_ms: Long, active_ms: Long,
      rms: Double)

  /** Energy segmentation of channel-0 PCM — the speech/sound-span
    * extractor that pairs with [[SubtitleOps]] transcripts and feeds
    * silence trimming: frame into `frameMs` windows, a window is ACTIVE
    * iff its RMS exceeds `thresholdFrac` of the clip's peak amplitude
    * (relative, so the gate is bit-depth- and gain-free), merge active
    * runs separated by less than `minSilenceMs` of quiet (adjacent
    * active windows never split). Spans are window-granular with
    * SAMPLE-exact times (window boundary sample × 1000 / rate — never
    * the truncated window-count ms, which drifts at rates like
    * 11025 Hz). None for non-PCM payloads; a decodable clip with no
    * active window yields an empty vector (all silence ≠
    * unparseable). */
  def wavSegments(
      b: Array[Byte],
      frameMs: Int = 10,
      thresholdFrac: Double = 0.1,
      minSilenceMs: Int = 200): Option[Vector[WavSegment]] = {
    require(frameMs > 0 && thresholdFrac >= 0 && minSilenceMs >= 0,
      "need frameMs > 0, thresholdFrac >= 0, minSilenceMs >= 0")
    decodeWavChannel0(b).map { case (rate, samples) =>
      val spf = math.max(1, rate * frameMs / 1000)
      val nWin = (samples.length + spf - 1) / spf
      if (nWin == 0) Vector.empty
      else {
      var peak = 0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i)); if (a > peak) peak = a; i += 1
      }
      val threshold = thresholdFrac * peak
      val meanSq = new Array[Double](nWin)
      val active = new Array[Boolean](nWin)
      var w = 0
      while (w < nWin) {
        val from = w * spf
        val until = math.min(from + spf, samples.length)
        var ss = 0.0
        var k = from
        while (k < until) { ss += samples(k).toDouble * samples(k); k += 1 }
        meanSq(w) = ss / math.max(1, until - from)
        active(w) = peak > 0 && math.sqrt(meanSq(w)) > threshold
        w += 1
      }
      // adjacent active windows (gap 0) NEVER split, whatever the
      // floor — a split needs actual silence; floor below one frame
      // means "any silence splits"
      val gapWins = math.max(1, minSilenceMs / frameMs)
      val out = Vector.newBuilder[WavSegment]
      var n = 0
      var segStart = -1
      var lastActive = -1
      // times derive from SAMPLE positions, not window*frameMs: when
      // rate*frameMs/1000 truncates (e.g. 11025 Hz), window-count ms
      // would drift from audio time by the truncated remainder per
      // window — ruinous for the cue-alignment join this feeds
      @inline def winMs(win: Long): Long = win * spf * 1000L / rate
      def close(): Unit = if (segStart >= 0) {
        n += 1
        var ss = 0.0
        var act = 0L
        var k = segStart
        while (k <= lastActive) {
          if (active(k)) { ss += meanSq(k); act += 1 }
          k += 1
        }
        out += WavSegment(n, winMs(segStart.toLong),
          winMs(lastActive + 1L), winMs(act),
          math.sqrt(ss / act))
        segStart = -1
      }
      w = 0
      while (w < nWin) {
        if (active(w)) {
          if (segStart < 0) segStart = w
          else if (w - lastActive - 1 >= gapWins) { close(); segStart = w }
          lastActive = w
        }
        w += 1
      }
      close()
      out.result()
      }
    }
  }

  /** Segments over a (id, bytes) audio table — (idCol, pcm_ok, segment,
    * start_ms, end_ms, active_ms, rms); all-silence clips emit one
    * NULL-segment row (decoded, nothing active), non-PCM rows flag. */
  def wavSegmentPlan(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id",
      frameMs: Int = 10,
      thresholdFrac: Double = 0.1,
      minSilenceMs: Int = 200): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (if (bytes == null) None
         else wavSegments(bytes, frameMs, thresholdFrac, minSilenceMs)) match {
          case Some(ss) if ss.nonEmpty => ss.map(s => (id, true,
            Some(s.segment), Some(s.start_ms), Some(s.end_ms),
            Some(s.active_ms), Some(s.rms)))
          case Some(_) => Seq((id, true, None, None, None, None, None))
          case None => Seq((id, false, None, None, None, None, None))
        }
      }
      .toDF(idCol, "pcm_ok", "segment", "start_ms", "end_ms", "active_ms",
        "rms")
  }

  /** Segmentation fixture (8 kHz mono 16-bit, every span a construction
    * literal): 110. 100 ms silence, 200 ms square at ±1000, 150 ms
    * silence, 100 ms square at ±2000, 50 ms silence — the 150 ms gap
    * merges under the default 200 ms silence floor; 111. all silence;
    * 112. not a WAV. */
  def wavSegFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def square(amp: Int, samples: Int): Array[Short] =
      Array.tabulate(samples)(i => (if (i % 8 < 4) amp else -amp).toShort)
    def silence(samples: Int): Array[Short] = new Array[Short](samples)
    def pcm(parts: Array[Short]*): Array[Byte] = {
      val all = parts.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(all.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      all.foreach(bb.putShort)
      wavBytes(1, 8000, 16, 1, bb.array())
    }
    Seq(
      110L -> pcm(silence(800), square(1000, 1600), silence(1200),
        square(2000, 800), silence(400)),
      111L -> pcm(silence(1000)),
      112L -> "no RIFF here".getBytes("US-ASCII")
    ).toDF("media_id", "bytes")
  }

  /** Envelope signatures over a (id, bytes) audio table —
    * (idCol, pcm_ok, env_hash), partition-iterator shape; feed the
    * `env_hash` column to
    * [[graft.operators.Dedup.simHashPairsFromSignatures]] for the audio
    * twin of image aHash near-dup. */
  def wavEnvelopeSigs(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (if (bytes == null) None else wavEnvelopeHash(bytes)) match {
          case Some(h) => (id, true, Some(h))
          case None    => (id, false, None)
        }
      })
      .toDF(idCol, "pcm_ok", "env_hash")
  }

  /** Channel-0 PCM statistics over a (id, bytes) audio table — the
    * sample-level twin of the header probes, same partition-iterator
    * shape and adversarial-bytes contract as [[imageFeatures]]. */
  def wavStats(
      media: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          (if (bytes == null) None else decodeWavPcm(bytes)) match {
            case Some(p) =>
              (id, true, Some(p.channels), Some(p.sampleRate),
                Some(p.bitsPerSample), Some(p.nFrames), Some(p.durationMs),
                Some(p.rms), Some(p.peak), Some(p.zeroCrossings))
            case None =>
              (id, false, None, None, None, None, None, None, None, None)
          }
        }
      }
      .toDF(idCol, "pcm_ok", "channels", "sample_rate", "bits",
        "n_frames", "duration_ms", "rms", "peak", "zero_crossings")
  }

  // ------------------------------------------------------ decode fixtures

  /** Hand-built 24-bit BMP (54-byte header + bottom-up BGR rows padded
    * to 4 bytes) — every byte placed by this code, so decoded pixels are
    * literal construction values, not codec output. `gray(x, y)` gives
    * the 0..255 value for all three channels. */
  private[graft] def bmpGray(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = gray(x, y).toByte
        b.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Encode an RGB pixel function through the JDK's own ImageIO writer
    * (png/gif/jpg) — the pixels are construction literals; PNG/GIF are
    * lossless so the decode side recovers them exactly. */
  private[graft] def encodeImage(
      fmt: String, w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def grayRgb(v: Int): Int = (v << 16) | (v << 8) | v

  /** Deterministic image-decode fixture — six rows whose pixel features
    * are hand-computable from the documented luma/downsample/hash spec:
    *   1. hand-built BMP 8×8, gray columns v = 16·x (aHash 0xF0 rows,
    *      dHash 0xFE rows, means exactly 56)
    *   2. PNG 16×16, gray 2-row bands v = 16·⌊y/2⌋ (exact 2×2 block
    *      means → aHash rows 4-7, dHash 0, means 56)
    *   3. GIF 8×8, left half 0 / right half 255 (aHash 0xF0 rows, dHash
    *      bit 4 per row, means 127.5)
    *   4. JPEG 32×16 solid mid-gray — lossy, so only decode_ok/dims and
    *      the uniform-image hash contract (strictly-above-mean → 0) are
    *      pinned, never channel means
    *   5. corrupt bytes (decode must cost a null, not a task)
    *   6. a WebP VP8L header — header-probed as webp, but NOT decodable
    *      by the JDK (no reader): decode_ok=false while format='webp'
    *      pins the probe-vs-decode distinction. */
  def imageFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val webp = {
      val b = java.nio.ByteBuffer.allocate(30) // probeImage's RIFF gate needs ≥30
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(22)
      b.put("WEBP".getBytes("US-ASCII")).put("VP8L".getBytes("US-ASCII"))
      b.putInt(10).put(0x2f.toByte)
      // 14-bit w-1 = 7, 14-bit h-1 = 7 → 8×8 declared
      b.putInt(7 | (7 << 14))
      b.array()
    }
    Seq(
      1L -> bmpGray(8, 8, (x, _) => 16 * x),
      2L -> encodeImage("png", 16, 16, (_, y) => grayRgb(16 * (y / 2))),
      3L -> encodeImage("gif", 8, 8, (x, _) => grayRgb(if (x < 4) 0 else 255)),
      4L -> encodeImage("jpg", 32, 16, (_, _) => grayRgb(128)),
      5L -> Array[Byte](0x13, 0x37, -1, -2, -3, -4, -5, -6),
      6L -> webp
    ).toDF("media_id", "bytes")
  }

  /** Perceptual near-dup fixture — five images forming two planted
    * near-dup pairs under aHash Hamming distance ≤ 3:
    *   10. BMP 8×8 column gradient (aHash 0xF0F0F0F0F0F0F0F0)
    *   11. same gradient with row-0 cells (0,0)/(4,0) value-swapped —
    *       the swap keeps the 64-cell mean (same multiset) and flips
    *       exactly bits 0 and 4 → distance 2 from #10
    *   12. PNG 16×16 row-band gradient (aHash 0xFFFFFFFF00000000)
    *   13. GIF 8×8 row gradient v = 16·y — DIFFERENT format and pixel
    *       grid, same 8×8 luma means → distance 0 from #12 (the
    *       recompressed-copy case perceptual hashing exists for)
    *   14. GIF 8×8 checkerboard — far from everything, and sharing NO
    *       16-bit band with any other row (never even a candidate). */
  def imageNearDupFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      10L -> bmpGray(8, 8, (x, _) => 16 * x),
      11L -> bmpGray(8, 8, (x, y) =>
        if (y == 0 && x == 0) 64 else if (y == 0 && x == 4) 0 else 16 * x),
      12L -> encodeImage("png", 16, 16, (_, y) => grayRgb(16 * (y / 2))),
      13L -> encodeImage("gif", 8, 8, (_, y) => grayRgb(16 * y)),
      14L -> encodeImage("gif", 8, 8,
        (x, y) => grayRgb(if ((x + y) % 2 == 0) 255 else 0))
    ).toDF("media_id", "bytes")
  }

  /** Apply an EXIF display orientation (tag 0x0112, values 1-8) to a
    * row-major luma grid — the normalization step BEFORE hashing or
    * thumbnailing a camera image (two phone photos of the same scene
    * often differ only by this tag; hashed un-normalized they read as
    * distinct). Mapping per the TIFF/EXIF spec: 1 identity, 2 flip-H,
    * 3 rotate 180, 4 flip-V, 5 transpose, 6 rotate 90 CW, 7 transverse,
    * 8 rotate 270 CW; 5-8 swap the output dimensions. Unknown values
    * pass through as identity. Returns (width, height, luma). */
  private[graft] def orientLuma(
      w: Int, h: Int, luma: Array[Int], orientation: Int): (Int, Int, Array[Int]) = {
    if (orientation <= 1 || orientation > 8) return (w, h, luma)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Int](luma.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // destination of source (x, y) under each orientation
        val (dx, dy) = orientation match {
          case 2 => (w - 1 - x, y)             // flip horizontal
          case 3 => (w - 1 - x, h - 1 - y)     // rotate 180
          case 4 => (x, h - 1 - y)             // flip vertical
          case 5 => (y, x)                     // transpose
          case 6 => (h - 1 - y, x)             // rotate 90 CW
          case 7 => (h - 1 - y, w - 1 - x)     // transverse
          case _ => (y, w - 1 - x)             // 8: rotate 270 CW
        }
        out(dy * ow + dx) = luma(y * w + x)
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  /** [[imageThumbnail]] with EXIF orientation normalization: each row's
    * payload is probed for the orientation tag ([[probeExif]] — JPEG
    * APP1 or standalone TIFF; absent/corrupt EXIF reads as identity)
    * and the decoded luma grid is re-oriented BEFORE the box resample,
    * so a sideways phone photo and its upright copy emit the same
    * thumbnail (and, fed onward, the same perceptual hash). Same
    * partition-iterator shape and adversarial-bytes contract. */
  def imageThumbnailOriented(
      media: DataFrame,
      tw: Int,
      th: Int,
      bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    require(tw > 0 && th > 0, "thumbnail dims must be positive")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          (if (bytes == null) None else decodePixels(bytes)) match {
            case Some(img) =>
              val g = pixelGrids(img)
              val o = probeExif(bytes).flatMap(_.orientation).getOrElse(1)
              val (ow, oh, oriented) = orientLuma(g.w, g.h, g.luma, o)
              (id, true, o, Some(boxDownsample(ow, oh, oriented, tw, th)))
            case None => (id, false, 1, None)
          }
        }
      }
      .toDF(idCol, "decode_ok", "orientation", "thumb")
  }

  /** pHash fixture — rows whose DCT structure exercises what the
    * gradient/near-dup fixtures cannot (pure 1-D gradients legitimately
    * pHash to 0: every AC coefficient of a monotone ramp sits at or
    * below the median):
    *   20. hand-built BMP 16×16 rich texture g = (37x+101y+13xy) mod 256
    *   21. its 2× NEAREST-NEIGHBOR upscale as a 32×32 BMP — the 32×32
    *       box downsample reproduces row 20's grid exactly, so the two
    *       resolutions hash IDENTICALLY (the resize-robustness property
    *       pHash exists for)
    *   22. GIF checkerboard (rich high-frequency spectrum)
    *   23. uniform BMP (hashes to 0 — the pinned degenerate case). */
  def pHashFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def tex(x: Int, y: Int): Int = (x * 37 + y * 101 + x * y * 13) % 256
    Seq(
      20L -> bmpGray(16, 16, tex),
      21L -> bmpGray(32, 32, (x, y) => tex(x / 2, y / 2)),
      22L -> encodeImage("gif", 8, 8,
        (x, y) => grayRgb(if ((x + y) % 2 == 0) 255 else 0)),
      23L -> bmpGray(8, 8, (_, _) => 77)
    ).toDF("media_id", "bytes")
  }

  /** PCM square-wave fixture — WAV payloads whose sample statistics are
    * closed-form in the row id: 16-bit mono 8 kHz square waves of
    * amplitude A = 1000·(1 + id%3) and 10+(id%5) periods of 8 frames
    * (4 at +A then 4 at −A), so RMS = A exactly, peak = A, zero
    * crossings = 2·periods − 1, duration = frames/8 ms. Rows 20-25;
    * row 26 is an 8-bit variant (A=50 → samples 178/78), row 27 stereo
    * (channel 1 silent — stats read channel 0 only), row 28 a FLOAT
    * format WAV (pcm_ok=false: not integer PCM), row 29 corrupt. */
  def wavPcmFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def wav = wavBytes _
    def square16(ch: Int, amp: Int, periods: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(periods * 8 * ch * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var f = 0
      while (f < periods * 8) {
        val s = if (f % 8 < 4) amp else -amp
        var c = 0
        while (c < ch) { b.putShort(if (c == 0) s.toShort else 0); c += 1 }
        f += 1
      }
      b.array()
    }
    val base = (20L to 25L).map { id =>
      val amp = 1000 * (1 + (id % 3).toInt)
      val periods = 10 + (id % 5).toInt
      id -> wav(1, 8000, 16, 1, square16(1, amp, periods))
    }
    val sq8 = { // 8-bit unsigned, centered 128: +50 → 178, −50 → 78
      val d = Array.tabulate(80)(f => (if (f % 8 < 4) 178 else 78).toByte)
      wav(1, 8000, 8, 1, d)
    }
    val extras = Seq(
      26L -> sq8,
      27L -> wav(2, 16000, 16, 1, square16(2, 3000, 12)),
      28L -> wav(1, 8000, 32, 3, new Array[Byte](64)), // IEEE float fmt
      29L -> Array[Byte]('R', 'I', 'F', 'F', 0, 0))
    (base ++ extras).toDF("media_id", "bytes")
  }

  /** ISO-BMFF box: 32-bit size + type + payload. */
  private[graft] def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    mp4Be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }
  private[graft] def mp4Be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private[graft] def mp4Be64(v: Long): Array[Byte] =
    mp4Be32(v >>> 32) ++ mp4Be32(v & 0xffffffffL)

  /** MP4 keyframe fixture — hand-built sample tables whose plans are
    * construction literals:
    *   40. video track, timescale 1000, 8 samples (delta 100, sizes
    *       10..80), TWO stsc runs (chunk 1 holds 3 samples, chunks 2+
    *       hold 5), stco [1000, 2000], stss [1, 5] → keyframe 1 at
    *       (t 0, off 1000, size 10); keyframe 5 is the SECOND sample of
    *       chunk 2 → (t 400, off 2000+40, size 50)
    *   41. NO stss (spec: every sample syncs), uniform size 500,
    *       timescale 100 / delta 40, spc 2, co64 offsets [5000, 9000] →
    *       (1, 0, 5000), (2, 400, 5500), (3, 800, 9000)
    *   42. audio-only track (hdlr 'soun') → no video plan
    *   43. corrupt bytes. */
  def mp4Fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), mp4Be32(0))
    def mdhd(timescale: Long, dur: Long) = mp4Box("mdhd",
      mp4Be32(0), mp4Be32(0), mp4Be32(0), mp4Be32(timescale), mp4Be32(dur),
      mp4Be32(0))
    def hdlr(handler: String) = mp4Box("hdlr",
      mp4Be32(0), mp4Be32(0), handler.getBytes("US-ASCII"),
      new Array[Byte](13))
    def stts(runs: (Long, Long)*) = mp4Box("stts",
      mp4Be32(0), mp4Be32(runs.length),
      runs.toArray.flatMap { case (c, d) => mp4Be32(c) ++ mp4Be32(d) })
    def stszTable(sizes: Long*) = mp4Box("stsz",
      mp4Be32(0), mp4Be32(0), mp4Be32(sizes.length),
      sizes.toArray.flatMap(mp4Be32))
    def stszUniform(size: Long, n: Long) = mp4Box("stsz",
      mp4Be32(0), mp4Be32(size), mp4Be32(n))
    def stsc(runs: (Long, Long)*) = mp4Box("stsc",
      mp4Be32(0), mp4Be32(runs.length),
      runs.toArray.flatMap { case (f, s) => mp4Be32(f) ++ mp4Be32(s) ++ mp4Be32(1) })
    def stco(offs: Long*) = mp4Box("stco",
      mp4Be32(0), mp4Be32(offs.length), offs.toArray.flatMap(mp4Be32))
    def co64(offs: Long*) = mp4Box("co64",
      mp4Be32(0), mp4Be32(offs.length), offs.toArray.flatMap(mp4Be64))
    def stss(ks: Long*) = mp4Box("stss",
      mp4Be32(0), mp4Be32(ks.length), ks.toArray.flatMap(mp4Be32))
    def mvhd(timescale: Long, dur: Long) = mp4Box("mvhd",
      mp4Be32(0), mp4Be32(0), mp4Be32(0), mp4Be32(timescale), mp4Be32(dur),
      mp4Be32(0))
    def movie(handler: String, mv: Array[Byte], md: Array[Byte],
        tables: Array[Byte]*) =
      ftyp ++ mp4Box("moov", mv, mp4Box("trak", mp4Box("mdia",
        md, hdlr(handler),
        mp4Box("minf", mp4Box("stbl", tables: _*)))))
    val v40 = movie("vide", mvhd(1000, 800), mdhd(1000, 800),
      stts(8L -> 100L), stszTable(10, 20, 30, 40, 50, 60, 70, 80),
      stsc(1L -> 3L, 2L -> 5L), stco(1000, 2000), stss(1, 5))
    val v41 = movie("vide", mvhd(100, 120), mdhd(100, 120),
      stts(3L -> 40L), stszUniform(500, 3), stsc(1L -> 2L),
      co64(5000, 9000))
    val a42 = movie("soun", mvhd(8000, 100), mdhd(8000, 100),
      stts(2L -> 10L), stszUniform(100, 2), stsc(1L -> 2L), stco(100))
    Seq(
      40L -> v40,
      41L -> v41,
      42L -> a42,
      43L -> Array[Byte](0, 0, 0, 9, 'f', 'r', 'e', 'e', 0)
    ).toDF("media_id", "bytes")
  }

  /** MP3 frame-index fixture — hand-built MPEG2 Layer III streams
    * (24 kHz, 576 samples/frame → exactly 24 ms/frame, so every index
    * entry is a construction literal):
    *   50. CBR 64 kbps, 4 exact frames (192 B each, no trailer)
    *   51. VBR behind a 20-byte ID3v2 tag: 64 kbps (192 B), 96 kbps
    *       (288 B), 32 kbps with the PADDING slot (97 B), then trailing
    *       junk — the strict walk stops there
    *   52. CBR with a truncated third frame (header present, body cut
    *       at 100 of 192 B) — only the two complete frames index
    *   53. no frame sync anywhere (flagged, not dropped). */
  def mp3Fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // MPEG2 Layer III 24 kHz stereo: FF F3, byte2 = brIdx<<4 | srIdx 1<<2 | pad<<1
    def frame(brIdx: Int, len: Int, pad: Int = 0, cut: Int = 0): Array[Byte] = {
      val b = new Array[Byte](len + pad - cut)
      b(0) = 0xff.toByte; b(1) = 0xf3.toByte
      b(2) = ((brIdx << 4) | (1 << 2) | (pad << 1)).toByte
      b
    }
    def id3(payload: Int): Array[Byte] = {
      val b = new Array[Byte](10 + payload)
      "ID3".getBytes("US-ASCII").copyToArray(b, 0)
      b(9) = payload.toByte // payload < 128 fits the low syncsafe byte
      b
    }
    val f64 = frame(8, 192) // 72*64000/24000 = 192
    val f96 = frame(10, 288) // 72*96000/24000 = 288
    val f32p = frame(4, 96, pad = 1) // 72*32000/24000 + padding slot = 97
    Seq(
      50L -> (f64 ++ f64 ++ f64 ++ f64),
      51L -> (id3(20) ++ f64 ++ f96 ++ f32p ++ "JUNKJUNK".getBytes("US-ASCII")),
      52L -> (f64 ++ f64 ++ frame(8, 192, cut = 92)),
      53L -> "no frame sync anywhere in this buffer".getBytes("US-ASCII")
    ).toDF("media_id", "bytes")
  }

  /** FLAC frame-index fixture — hand-placed metadata + frame headers
    * (payloads are zero bytes: the index never reads content, and zeros
    * contain no false sync). Construction literals:
    *   80. fixed blocking, 3 frames: two 192-sample frames (rate code 7
    *       = 24000), then a SHORT last frame (block size 100 via the
    *       8-bit end-of-header code, rate code 0 = from STREAMINFO)
    *   81. variable blocking, 2 frames of 256 samples at 44100 — the
    *       second frame's sample number (256) takes the 2-byte coded
    *       form
    *   82. valid fLaC signature + STREAMINFO but no frame
    *   83. not FLAC. */
  def flacFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def withCrc(hdr: Array[Byte]): Array[Byte] =
      hdr :+ crc8(hdr, 0, hdr.length).toByte
    // STREAMINFO (last-block flag set): rate 24000, 2 ch, 16 bps
    val streaminfo = Array(0x80, 0, 0, 34).map(_.toByte) ++
      Array(0x00, 0xc0, 0x00, 0xc0, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
      Array(0x05, 0xdc, 0x02, 0xf0).map(_.toByte) ++ new Array[Byte](4 + 16)
    val magic = "fLaC".getBytes("US-ASCII") ++ streaminfo
    def fx(hdr: Int*)(pay: Int): Array[Byte] =
      withCrc(hdr.toArray.map(_.toByte)) ++ new Array[Byte](pay)
    val v80 = magic ++
      fx(0xff, 0xf8, 0x17, 0x18, 0x00)(20) ++ // frame 0, bs 192, 24 kHz
      fx(0xff, 0xf8, 0x17, 0x18, 0x01)(20) ++ // frame 1
      fx(0xff, 0xf8, 0x60, 0x18, 0x02, 0x63)(10) // frame 2: bs 100, sr code 0
    val v81 = magic ++
      fx(0xff, 0xf9, 0x89, 0x18, 0x00)(15) ++ // sample 0, bs 256, 44.1 kHz
      fx(0xff, 0xf9, 0x89, 0x18, 0xc4, 0x80)(9) // sample 256, 2-byte coding
    Seq(
      80L -> v80,
      81L -> v81,
      82L -> magic,
      83L -> "certainly not a flac stream".getBytes("US-ASCII")
    ).toDF("media_id", "bytes")
  }

  /** Minimal canonical-layout WAV (RIFF + fmt + data) around a raw
    * sample payload — every byte placed by this code. */
  private[graft] def wavBytes(
      ch: Int, rate: Int, bits: Int, fmt: Int, data: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(fmt.toShort)
    b.putShort(ch.toShort).putInt(rate).putInt(rate * ch * bits / 8)
    b.putShort((ch * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    b.array()
  }

  /** 16-bit mono WAV from a per-sample |amplitude| function applied over
    * `n` samples with alternating sign every 4 frames (so the envelope
    * is `amp` while statistics stay square-wave-shaped). */
  private[graft] def wavEnvelope16(
      rate: Int, n: Int, amp: Int => Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var f = 0
    while (f < n) {
      val a = amp(f)
      b.putShort((if (f % 8 < 4) a else -a).toShort)
      f += 1
    }
    wavBytes(1, rate, 16, 1, b.array())
  }

  /** Envelope near-dup fixture — five clips whose [[envHash64]] values
    * are closed-form in the bucket construction (640 samples → bucket i
    * covers samples [10·i, 10·i+10) exactly; the 1280-sample row is the
    * sample-duplication "resample"):
    *   30. amplitude-modulated square: A=2000 for the first half, A/2
    *       after → buckets 0-31 read 2000, 32-63 read 1000, mean 1500 →
    *       hash = bits 0-31 = 4294967295
    *   31. the SAME envelope shape at 2× the sample count and rate and
    *       1/4 the amplitude (500/250) → every bucket's time fraction
    *       unchanged, all buckets and mean scaled together — hash
    *       IDENTICAL to #30 (distance 0: the resampled/regained-copy
    *       case)
    *   32. ascending staircase A/4, A/2, 3A/4, A per quarter → buckets
    *       32-63 above the 0.625·A mean → hash = bits 32-63
    *       = -4294967296 (distance 64 from #30)
    *   33. #30 with bucket 33 loud (back to A) → mean 1515.625; bits
    *       0-31 and 33 → hash = 4294967295 | 2^33 (distance 1 from #30)
    *   34. constant amplitude (plain square) → every bucket at the mean
    *       → hash 0 (the pinned degenerate case). */
  def wavEnvelopeFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val A = 2000
    Seq(
      30L -> wavEnvelope16(8000, 640, f => if (f < 320) A else A / 2),
      31L -> wavEnvelope16(16000, 1280, f => if (f < 640) A / 4 else A / 8),
      32L -> wavEnvelope16(8000, 640, f => A / 4 * (1 + f / 160)),
      33L -> wavEnvelope16(8000, 640,
        f => if (f >= 330 && f < 340) A else if (f < 320) A else A / 2),
      34L -> wavEnvelope16(8000, 640, _ => A)
    ).toDF("media_id", "bytes")
  }

  /** Deterministic content-fingerprint pseudo-embedding — the fallback
    * feature vector for payloads whose CONTENT decode genuinely needs a
    * codec library this container lacks (MP3/MP4/FLAC samples and
    * frames). This is a content hash, NOT pixel/sample data, and rows
    * carrying it are marked `decoded = false` by [[extractFeatures]];
    * image rows get REAL pixel features via [[decodePixels]]. */
  private def contentFingerprint(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
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

  /** Frame sampling plan: every nth "frame" (fixed-size byte windows) —
    * video frame DECODE needs codecs this container lacks; the sampled
    * count drives batch sizing either way. */
  private def sampleFrames(bytes: Array[Byte], frameSize: Int, everyNth: Int): Int = {
    val frames = math.max(1, bytes.length / math.max(1, frameSize))
    (frames + everyNth - 1) / everyNth
  }

  /** Decode + feature-extract over a media table. mapPartitions keeps
    * decoder initialization per-partition, and the work scales with input
    * partitioning — repartition upstream to size batches for executor
    * memory. Image rows decode REAL pixels (ImageIO) into
    * [grayMean, meanR, meanG, meanB, width, height, popcount(aHash),
    * popcount(dHash)]; audio rows with PCM WAV payloads decode REAL
    * samples into [rms, peak, zeroCrossings, nFrames, channels, rate,
    * bits, durationMs]; everything else (compressed audio/video content —
    * the genuinely codec-bound set) carries the content-fingerprint
    * fallback with `decoded = false`. */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int = 4096,
      everyNth: Int = 10, resizeMaxSide: Int = 224): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
      rows.map { r =>
        // header-probed dimensions win over declared metadata when the
        // payload carries a recognizable image header (probeImage is real
        // byte inspection, independent of the pixel decode)
        val (w, h) = probeImage(r.bytes) match {
          case Some((_, pw, ph)) if r.kind == "image" => (pw, ph)
          case _ => (r.width, r.height)
        }
        val (rw, rh) = fitBox(w, h, resizeMaxSide)
        // audio twin of the image probe: header-only channels/rate/duration
        // so duration filters run without ever decoding samples (WAV first,
        // FLAC STREAMINFO as the other codec-free container)
        val wav =
          if (r.kind == "audio")
            probeWav(r.bytes).orElse(probeFlac(r.bytes)).orElse(probeMp3(r.bytes))
          else None
        val videoMs = if (r.kind == "video") probeMp4Duration(r.bytes) else None
        // REAL content decode where a codec-free path exists
        val pixelFeats: Option[Array[Float]] =
          if (r.kind == "image") decodePixels(r.bytes).map { img =>
            val g = pixelGrids(img)
            var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
            var i = 0
            while (i < g.argb.length) {
              val p = g.argb(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              sl += g.luma(i)
              i += 1
            }
            val n = g.argb.length.toFloat
            Array(sl / n, sr / n, sg / n, sb / n, g.w.toFloat, g.h.toFloat,
              java.lang.Long.bitCount(aHash64(g.w, g.h, g.luma)).toFloat,
              java.lang.Long.bitCount(dHash64(g.w, g.h, g.luma)).toFloat)
          } else None
        val pcmFeats: Option[Array[Float]] =
          if (r.kind == "audio") decodeWavPcm(r.bytes).map { p =>
            Array(p.rms.toFloat, p.peak.toFloat, p.zeroCrossings.toFloat,
              p.nFrames.toFloat, p.channels.toFloat, p.sampleRate.toFloat,
              p.bitsPerSample.toFloat, p.durationMs.toFloat)
          } else None
        val real = pixelFeats.orElse(pcmFeats)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = r.bytes.length,
          sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(r.bytes).map("%02x".format(_)).mkString,
          decoded = real.isDefined,
          features = real.getOrElse(contentFingerprint(r.bytes)),
          frames_sampled =
            if (r.kind == "video") sampleFrames(r.bytes, frameSize, everyNth) else 1,
          resized_w = rw,
          resized_h = rh,
          channels = wav.map(_._1),
          sample_rate = wav.map(_._2),
          duration_ms = wav.collect { case (_, _, ms) if ms >= 0 => ms }
            .orElse(videoMs))
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

  /** Deterministic WAV media from the documents fixture: each doc becomes a
    * real RIFF/WAVE payload (44-byte canonical header + text bytes as PCM
    * data) with channels = 1 + id%2 and sampleRate = 8000·(1 + id%4) — so
    * [[probeWav]] runs against genuine headers and an external oracle can
    * recompute channels/rate/duration from (doc_id, byte length) alone. */
  def syntheticWavMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val data = text.getBytes("UTF-8")
      val ch = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 4).toInt)
      val byteRate = rate * ch * 2
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + data.length)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")); b.putInt(16); b.putShort(1) // PCM
      b.putShort(ch.toShort); b.putInt(rate); b.putInt(byteRate)
      b.putShort((ch * 2).toShort); b.putShort(16)
      b.put("data".getBytes("US-ASCII")); b.putInt(data.length); b.put(data)
      MediaRow(id, "audio", b.array(), width = 0, height = 0, format = "wav")
    }
  }

  /** DataFrame-level feature table used by SparkEntry (columnar output,
    * metadata + content hash are oracle-checkable; the synthetic media
    * payloads are text bytes, so their `features` are the fingerprint
    * fallback — real pixel decode is oracle-gated by
    * q_multimodal_decode over [[imageFixture]]). */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(syntheticMedia(spark, docs))
      .toDF()
      .withColumn("feat_0", round(element_at(col("features"), 1), 6))
      .drop("features")

  // ------------------------------------------- dialect Column surface
  // Scalar-function forms of the media kernels, so curation gates like
  // `WHERE image_ok(bytes) AND hamming64(image_ahash(bytes), ...) <= 3`
  // run in dialect SQL. These are Scala UDFs by necessity (no Spark
  // builtin decodes pixels); the decode-once partition-iterator shape
  // ([[imageFeatures]]) remains the bulk path — the UDFs exist for SQL
  // reachability, and `image_features(b)` returns ONE struct per call so
  // a query needing several features pays one decode (Spark's
  // subexpression elimination collapses repeated identical calls inside
  // a project as well).

  /** Struct returned by the `image_features` dialect scalar — the
    * Column-shaped subset of [[imageFeatures]]'s row. */
  case class ImageFeats(
      decode_ok: Boolean,
      format: Option[String],
      width: Option[Int],
      height: Option[Int],
      ahash: Option[Long],
      dhash: Option[Long],
      phash: Option[Long],
      gray_mean: Option[Double])

  private def featsOf(bytes: Array[Byte]): ImageFeats = {
    javax.imageio.ImageIO.setUseCache(false) // static flag; cheap to re-set
    val fmt = if (bytes == null) None else probeImage(bytes).map(_._1)
    (if (bytes == null) None else decodePixels(bytes)) match {
      case Some(img) =>
        val g = pixelGrids(img)
        var sl = 0L
        var i = 0
        while (i < g.luma.length) { sl += g.luma(i); i += 1 }
        ImageFeats(decode_ok = true, fmt, Some(g.w), Some(g.h),
          Some(aHash64(g.w, g.h, g.luma)), Some(dHash64(g.w, g.h, g.luma)),
          Some(pHash64(g.w, g.h, g.luma)),
          Some(sl.toDouble / g.luma.length))
      case None =>
        ImageFeats(decode_ok = false, fmt, None, None, None, None, None, None)
    }
  }

  /** `image_features(bytes)` → struct(decode_ok, format, width, height,
    * ahash, dhash, phash, gray_mean). Decoded width/height; `format`
    * is the header probe (fills even when decode fails, e.g. WebP). */
  lazy val imageFeaturesCol: Column => Column = {
    val u = udf(featsOf _)
    c => u(c)
  }

  /** Header-probe struct (NO pixel decode — bytes-bounded header walk,
    * the cheap pre-decode gate): `(format, width, height)` as DECLARED
    * by the container, or NULL when no known signature matches. */
  case class ImageProbe(format: String, width: Int, height: Int)

  lazy val imageProbeCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None
      else probeImage(b).map { case (f, w, h) => ImageProbe(f, w, h) })
    c => u(c)
  }

  /** `exif_orientation(bytes)` → the TIFF/EXIF display orientation
    * (1-8) from a JPEG APP1 or standalone TIFF header, NULL when absent
    * or unparseable ([[probeExif]]'s bounds-checked walk). */
  lazy val exifOrientationCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else probeExif(b).flatMap(_.orientation))
    c => u(c)
  }

  /** `wav_stats(bytes)` → struct(channels, sampleRate, bitsPerSample,
    * nFrames, durationMs, rms, peak, zeroCrossings), NULL for non-PCM
    * payloads ([[decodeWavPcm]]'s contract). */
  lazy val wavStatsCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else decodeWavPcm(b))
    c => u(c)
  }

  /** `wav_envelope_hash(bytes)` → [[envHash64]] of the channel-0
    * samples; NULL for non-PCM payloads. */
  lazy val wavEnvelopeHashCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else wavEnvelopeHash(b))
    c => u(c)
  }

  /** Container-declared audio facts (codec-free header probes):
    * `(format, channels, rate, duration_ms)`; duration −1 when the
    * container declares no length, NULL struct when no signature
    * matches. */
  case class AudioProbe(
      format: String, channels: Int, rate: Int, duration_ms: Long)

  /** `audio_probe(bytes)` → the WAV → FLAC → MP3 header-probe chain
    * (same order [[extractFeatures]] uses) as one struct — the
    * pre-decode audio gate (channel/rate/length filters with zero
    * sample access). */
  lazy val audioProbeCol: Column => Column = {
    val u = udf { (b: Array[Byte]) =>
      if (b == null) None
      else probeWav(b).map(t => ("wav", t))
        .orElse(probeFlac(b).map(t => ("flac", t)))
        .orElse(probeMp3(b).map(t => ("mp3", t)))
        .map { case (f, (ch, rate, ms)) => AudioProbe(f, ch, rate, ms) }
    }
    c => u(c)
  }

  /** `mp4_duration_ms(bytes)` → [[probeMp4Duration]] (mvhd header walk,
    * no codec), NULL when not parseable ISO-BMFF. */
  lazy val mp4DurationCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else probeMp4Duration(b))
    c => u(c)
  }

  /** `mp3_frame_count(bytes)` → number of COMPLETE frames
    * [[mp3FrameIndex]] walks (strict header-to-header), NULL when no
    * complete frame indexes. */
  lazy val mp3FrameCountCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else mp3FrameIndex(b).map(_.length))
    c => u(c)
  }

  /** `gif_anim(bytes)` → [[gifAnimation]] as a struct (frames,
    * duration_ms, loops); NULL when not a well-formed GIF. */
  lazy val gifAnimCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) None else gifAnimation(b))
    c => u(c)
  }
}
