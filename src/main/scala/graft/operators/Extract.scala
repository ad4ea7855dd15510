package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-sniffing front door — ONE call from raw crawled bytes to
  * text. Declared content types lie (surveys of crawl archives put
  * mislabeled payloads in whole percents), so the router reads MAGIC
  * BYTES, not headers: every signature check delegates to the format's
  * own operator family ([[PdfOps]], [[ArchiveOps]], [[Multimodal]],
  * [[SubtitleOps]], [[HtmlOps]]), and [[autoText]] then routes to the
  * matching extractor — the same expressions a hand-written pipeline
  * would compose, selected per row. */
object Extract {

  /** Best-effort format label from magic bytes / cheap structure:
    * pdf, epub, docx, zip, gzip, tar, warc, png, jpeg, gif, bmp, tiff,
    * webp, wav, flac, mp3, mp4, vtt, srt, html, text, bin; null input →
    * null. Zip refines to epub/docx by member names (a bounded listing
    * walk, no member materialized); text-vs-bin is a printable-ratio
    * heuristic over the first 512 decoded chars. */
  def sniffFormat(b: Array[Byte]): Option[String] = {
    if (b == null) return None
    if (b.length < 4) return Some(textOrBin(b))
    @inline def u8(i: Int): Int = b(i) & 0xff
    def ascii(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(k => b(off + k) == s.charAt(k).toByte)
    if (ascii(0, "%PDF-")) return Some("pdf")
    if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) {
      // refine by member NAMES from the central directory — byte
      // arithmetic only; sniffing must not pay (or repeat) the member
      // inflation the extractor will do
      val names = ArchiveOps.zipCentralNames(b).getOrElse(Vector.empty)
      return Some(
        if (names.contains("META-INF/container.xml")) "epub"
        else if (names.contains("word/document.xml")) "docx"
        else "zip")
    }
    if (u8(0) == 0x1f && u8(1) == 0x8b) return Some("gzip")
    if (ascii(257, "ustar") || ArchiveOps.tarFirstHeader(b))
      return Some("tar")
    if (ascii(0, "WARC/")) return Some("warc")
    if (ascii(0, "fLaC")) return Some("flac")
    Multimodal.probeImage(b) match {
      case Some((fmt, _, _)) => return Some(fmt)
      case None => ()
    }
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) return Some("wav")
    if (b.length > 11 && ascii(4, "ftyp")) return Some("mp4")
    // TIFF magic BEFORE the mp3 scan: tiff is definitive 4 bytes, the
    // mp3 check is a heuristic scan
    if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
      return Some("tiff")
    // an ID3 tag or a CHAINED frame pair — a lone header pattern
    // matches random binary every few KB (probeMp3 alone would call
    // most 'bin' payloads mp3)
    if (Multimodal.looksLikeMp3(b)) return Some("mp3")
    val head = new String(b, 0,
      math.min(b.length, 1024), java.nio.charset.StandardCharsets.UTF_8)
    if (head.startsWith("WEBVTT")) return Some("vtt")
    // html BEFORE the srt timing heuristic: a page can quote a literal
    // "00:00:01,000 --> …" in its first bytes, an SRT never embeds <html
    val lower = head.toLowerCase(java.util.Locale.ROOT)
    if (lower.contains("<html") || lower.startsWith("<!doctype html"))
      return Some("html")
    if (SubtitleOps.timingPat.matcher(
        head.substring(0, math.min(head.length, 300))).find())
      return Some("srt")
    if (head.contains("\\documentclass") || head.contains("\\begin{document}"))
      return Some("latex")
    Some(textOrBin(b))
  }

  private def textOrBin(b: Array[Byte]): String = {
    val s = new String(b, 0, math.min(b.length, 512),
      java.nio.charset.StandardCharsets.UTF_8)
    if (s.isEmpty) return "bin"
    var bad = 0
    s.foreach { c =>
      if (c == '�' || (Character.isISOControl(c) &&
          c != '\n' && c != '\r' && c != '\t')) bad += 1
    }
    if (bad * 20 <= s.length) "text" else "bin" // ≤5% junk chars
  }

  /** `sniff_format(bytes)` dialect scalar. */
  lazy val sniffFormatCol: Column => Column = {
    val u = udf(sniffFormat _)
    c => u(c)
  }

  /** One-call bytes → text across every text-bearing format the engine
    * extracts: html/text decode (UTF-8), pdf, epub (and zips of pages),
    * docx, latex, srt/vtt, wikitext is NOT guessed (no reliable
    * signature — call [[TextOps.wikiText]] when provenance says wiki),
    * gzip inflates then re-routes ONE level (a .txt.gz / .html.gz
    * member; gzip-in-gzip returns null rather than recursing). Formats
    * with no text semantics (images, audio, video, tar, warc —
    * multi-record, route records via [[graft.sources.Ingest.warc]]) →
    * null. The router is a lazy CASE: only the matched branch's
    * extractor runs per row. */
  def autoText(bytes: Column): Column =
    autoTextFor(sniffFormatCol(bytes), bytes)

  /** The router given an ALREADY-SNIFFED format column — use when the
    * plan carries `sniff_format` as its own column so the (zip-walking)
    * sniff runs exactly once per row ([[autoTextPlan]] does this). */
  def autoTextFor(fmt: Column, bytes: Column): Column = {
    val inner = ArchiveOps.gunzipCol(bytes)
    route(fmt, bytes)
      .when(fmt === "gzip", route(sniffFormatCol(inner), inner))
  }

  /** ONE format→extractor table (a new text-bearing format is added
    * exactly here); gzip re-routing composes on top in
    * [[autoTextFor]]. */
  private def route(fmt: Column, bytes: Column): Column = {
    def decoded = decode(bytes, "UTF-8")
    when(fmt === "html", HtmlOps.extractText(decoded))
      .when(fmt === "text", HtmlOps.normalizeWs(decoded))
      .when(fmt === "latex", TextOps.latexText(decoded))
      .when(fmt === "pdf",
        PdfOps.pdfTextStructCol(bytes).getField("text"))
      .when(fmt === "epub" || fmt === "zip", ArchiveOps.epubText(bytes))
      .when(fmt === "docx", ArchiveOps.docxText(bytes))
      .when(fmt === "vtt" || fmt === "srt",
        SubtitleOps.subtitleTextCol(bytes.cast("string")))
  }

  /** Routed extraction over a (id, bytes) table — (idCol, format,
    * text); formats with no text extractor keep their label with NULL
    * text, so the format census and the extraction coverage audit are
    * the same scan. */
  def autoTextPlan(
      df: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
        col(bytesCol).as("__bytes"),
        sniffFormatCol(col(bytesCol)).as("format"))
      .select(col(idCol), col("format"),
        autoTextFor(col("format"), col("__bytes")).as("text"))

  /** Per-format ingestion audit of a raw-bytes batch — (format, n_docs,
    * n_extracted, text_chars): the release-gate table answering "what
    * did the crawl contain and how much of it became text". One routed
    * scan + one partial-agg shuffle over a format-sized key space. */
  def extractionReport(
      df: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id"): DataFrame =
    autoTextPlan(df, bytesCol, idCol)
      .groupBy("format")
      .agg(count(lit(1)).as("n_docs"),
        count(col("text")).as("n_extracted"),
        coalesce(sum(length(col("text"))), lit(0L)).as("text_chars"))
}
