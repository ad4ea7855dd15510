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
      resized_h: Int,
      // audio header metadata (probeWav — real byte inspection); None for
      // non-audio rows and unrecognizable payloads
      channels: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  /** Resize stub: target box fit preserving aspect ratio — the metadata
    * arithmetic is real; a codec-backed version would also rescale pixels. */
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
    // bitrate (kbps) tables indexed by the 4-bit header field; 0 = "free"
    // and 15 = invalid are both rejected below
    val v1l1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
    val v1l2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
    val v1l3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val v2l1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
    val v2l23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    val limit = math.min(b.length - 4, off + 65536)
    var i = off
    while (i <= limit && i + 3 < b.length) {
      if (u8(i) == 0xff && (u8(i + 1) & 0xe0) == 0xe0) {
        val ver = (u8(i + 1) >> 3) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
        val layer = (u8(i + 1) >> 1) & 3 // 1=III, 2=II, 3=I
        val brIdx = (u8(i + 2) >> 4) & 0xf
        val srIdx = (u8(i + 2) >> 2) & 3
        if (ver != 1 && layer != 0 && brIdx != 0 && brIdx != 15 && srIdx != 3) {
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
          // ms = bytes*8 bits / (kbps*1000 bits/s) * 1000 = bytes*8/kbps
          return Some((ch, rate, (b.length - i).toLong * 8L / kbps))
        }
      }
      i += 1
    }
    None
  }

  /** MP4/ISO-BMFF duration probe: walks top-level boxes to `moov`, then its
    * children to `mvhd`, and returns duration in ms from the movie header's
    * timescale/duration fields (v0 and v1 layouts). Header-only — a video
    * length filter runs without touching a single codec frame. */
  def probeMp4Duration(b: Array[Byte]): Option[Long] = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)).toLong & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] { // (type, payloadStart, payloadEnd)
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
    rows.toDF("media_id", "bytes").as[(Long, Array[Byte])].map { case (id, bs) =>
      val e = probeExif(bs)
      (id, e.isDefined, e.flatMap(_.orientation), e.flatMap(_.captured_at),
        e.exists(_.has_gps))
    }.toDF("media_id", "exif_ok", "orientation", "captured_at", "has_gps")
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
        // header-probed dimensions win over declared metadata when the
        // payload carries a recognizable image header (probeImage is real
        // byte inspection, not part of the decode stub)
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
    * metadata + content hash are oracle-checkable; features are stub-only). */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(syntheticMedia(spark, docs))
      .toDF()
      .withColumn("feat_0", round(element_at(col("features"), 1), 6))
      .drop("features")
}
