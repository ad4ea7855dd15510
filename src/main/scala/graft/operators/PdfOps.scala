package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-based PDF text extraction — no PDF library, no codecs beyond the
  * JDK's own `java.util.zip.Inflater` (the FlateDecode filter IS
  * deflate). PDFs are a first-class training-data source; the pipeline
  * shape is (doc_id, bytes) → visible text + page count, exactly like
  * [[HtmlOps.extractText]] for HTML.
  *
  * Scope, pinned honestly:
  *   - STREAM DISCOVERY is a linear byte scan for `stream…endstream`
  *     framing rather than a full xref/trailer walk — robust to the
  *     incremental-update and broken-xref files a crawl actually
  *     contains (the same reason HtmlOps tolerates unclosed tags), at
  *     the cost that a binary stream containing the literal bytes
  *     `endstream` truncates that one stream early.
  *   - TEXT decoding covers literal strings (all escapes, nested
  *     parens), hex strings, and the Tj/TJ/'/" show operators inside
  *     BT…ET blocks, with Td, TD, T*, ' and " treated as line breaks.
  *     String
  *     bytes map to text as Latin-1 — correct for the Standard/WinAnsi
  *     encodings that dominate; CID/multi-byte fonts would need
  *     ToUnicode CMap resolution and emit their raw bytes here
  *     (deliberately out of scan-path scope, like the MP3/MP4 content
  *     decode in [[Multimodal]]).
  *   - PAGE COUNT is the number of `/Type /Page` (not `/Pages`) object
  *     dicts in the raw file plus any inflated streams (covers
  *     object-stream-packed page trees).
  */
object PdfOps {

  /** Extraction result: page count, how many `stream` objects the scan
    * framed, how many decoded to text-bearing content, and the text
    * (stream order, lines joined with '\n'). */
  case class PdfText(
      pages: Int, n_streams: Int, n_text_streams: Int, text: String)

  private val pagePat = java.util.regex.Pattern.compile("/Type\\s*/Page(?![a-zA-Z])")
  private val flatePat = java.util.regex.Pattern.compile("/(?:Filter\\s*/)?FlateDecode")

  /** Extract text + page count from one PDF. None when the `%PDF-`
    * signature is absent; a parseable PDF with no text yields
    * `text = ""`. `maxStreamBytes` bounds any single inflated stream —
    * a stream exceeding it is skipped (counted, not text), so a
    * deflate bomb costs one bounded buffer, never the executor. */
  def extractPdfText(b: Array[Byte], maxStreamBytes: Int = 1 << 26): Option[PdfText] = {
    if (b == null || b.length < 8) return None
    if (!(b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-'))
      return None
    val raw = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    var pages = countPages(raw)
    var nStreams = 0
    var nText = 0
    val text = new StringBuilder
    var p = 0
    while (p >= 0 && p < raw.length) {
      val si = raw.indexOf("stream", p)
      if (si < 0) p = -1
      else if (si >= 3 && raw.regionMatches(si - 3, "end", 0, 3)) {
        p = si + 6 // the "stream" inside an "endstream" keyword
      } else {
        // keyword must be followed by EOL per spec; data starts after it
        var ds = si + 6
        if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
        if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
        val ei = raw.indexOf("endstream", ds)
        if (ei < 0) p = -1 // truncated tail: no more framed streams
        else {
          nStreams += 1
          // the object's dict: from the owning "obj" keyword to "stream"
          val dictStart = math.max(0, raw.lastIndexOf("obj", si))
          val dict = raw.substring(dictStart, si)
          var de = ei
          if (de > ds && raw.charAt(de - 1) == '\n') de -= 1
          if (de > ds && raw.charAt(de - 1) == '\r') de -= 1
          val flate = flatePat.matcher(dict).find()
          decodeStream(b, ds, de, dict, maxStreamBytes) match {
            case Some(cs) =>
              // raw (no-filter) stream bytes are already part of the
              // whole-file page census — only INFLATED content adds
              if (flate) pages += countPages(cs)
              contentText(cs) match {
                case Some(t) =>
                  nText += 1
                  if (text.nonEmpty && t.nonEmpty) text.append('\n')
                  text.append(t)
                case None => ()
              }
            case None => () // undecodable (foreign filter / corrupt / capped)
          }
          p = ei + 9
        }
      }
    }
    Some(PdfText(pages, nStreams, nText, text.result()))
  }

  private def countPages(s: String): Int = {
    val m = pagePat.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // Inflater wraps native zlib state — construction dominates small
  // streams, and a 100 TB PDF corpus inflates millions of them; one
  // per executor thread, reset between streams (the same pattern as
  // TextKernels' ThreadLocal Deflater for the compression window)
  private val inflaters = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater()
  }

  /** Stream payload → content characters: raw when the dict declares no
    * filter, inflate when FlateDecode, None for any other filter, a
    * failed inflate, or output past the cap. */
  private def decodeStream(
      b: Array[Byte], from: Int, until: Int, dict: String,
      cap: Int): Option[String] = {
    val hasFilter = dict.contains("/Filter")
    val flate = flatePat.matcher(dict).find()
    if (hasFilter && !flate) return None // DCTDecode images etc.
    if (!flate)
      return Some(new String(b, from, until - from,
        java.nio.charset.StandardCharsets.ISO_8859_1))
    val inf = inflaters.get()
    inf.reset()
    try {
      inf.setInput(b, from, until - from)
      val out = new java.io.ByteArrayOutputStream(math.min(cap, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated deflate / preset-dictionary stream
        out.write(buf, 0, n)
        if (out.size() > cap) return None // bomb guard: skip, loudly bounded
      }
      Some(out.toString("ISO-8859-1"))
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.reset()
  }

  /** Text shown by a content stream's BT…ET blocks, or None when the
    * stream carries no complete text block (the content-vs-binary
    * routing signal). Lines join with '\n'; empty lines drop. */
  private[graft] def contentText(cs: String): Option[String] = {
    if (!cs.contains("BT")) return None
    val lines = Vector.newBuilder[String]
    val line = new StringBuilder
    var sawText = false
    var inText = false
    def endLine(): Unit = {
      if (line.nonEmpty) { lines += line.result(); line.clear() }
    }
    // string operands accumulated since the last operator keyword
    var args = List.empty[String]
    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') {
        val (s, next) = literalString(cs, i)
        args ::= s; i = next
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val (s, next) = hexString(cs, i)
        args ::= s; i = next
      } else if (c == '<') { i += 2 } // dict open <<
      else if (c == '\'' || c == '"') {
        // next-line-and-show operators (the string is the last operand)
        if (inText) {
          endLine()
          args.headOption.foreach(line ++= _)
          sawText = true
        }
        args = Nil; i += 1
      } else if (c == '%') { // comment to EOL
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c.isLetter || c == '*') {
        val start = i
        while (i < n && (cs.charAt(i).isLetterOrDigit || cs.charAt(i) == '*')) i += 1
        cs.substring(start, i) match {
          case "BT" => inText = true; sawText = true
          case "ET" => inText = false; endLine()
          case "Tj" =>
            if (inText) args.headOption.foreach(line ++= _)
            args = Nil
          case "TJ" => // array arg: strings were pushed newest-first
            if (inText) args.reverse.foreach(line ++= _)
            args = Nil
          case "Td" | "TD" | "T*" =>
            if (inText) endLine()
            args = Nil
          case _ => args = Nil // any other operator consumes its operands
        }
      } else i += 1
    }
    endLine()
    if (sawText) Some(lines.result().mkString("\n")) else None
  }

  /** PDF literal string starting at `(`: unescaped parens NEST; escapes
    * \n \r \t \b \f \( \) \\ and 1-3 digit octal; a backslash-newline
    * is a line continuation. Returns (decoded, index after close). */
  private[graft] def literalString(cs: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        cs.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '\n' => i += 2 // continuation
          case '\r' =>
            i += 2
            if (i < n && cs.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1
            while (k < n && k < i + 4 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              v = v * 8 + (cs.charAt(k) - '0'); k += 1
            }
            sb += (v & 0xff).toChar; i = k
          case other => sb += other; i += 2
        }
      } else if (c == '(') { depth += 1; sb += c; i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) sb += c
        i += 1
      } else { sb += c; i += 1 }
    }
    (sb.result(), i)
  }

  /** PDF hex string `<48 65…>`: whitespace ignored, an odd final digit
    * pads with 0 per spec. Returns (decoded, index after `>`). */
  private[graft] def hexString(cs: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = open + 1
    var hi = -1
    val n = cs.length
    while (i < n && cs.charAt(i) != '>') {
      val c = cs.charAt(i)
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { sb += ((hi << 4) | d).toChar; hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb += (hi << 4).toChar
    ((sb.result(), math.min(n, i + 1)))
  }

  /** Extraction over a (id, bytes) table — (idCol, pdf_ok, pages,
    * n_streams, n_text_streams, text); non-PDF rows flag, never drop
    * (same routing contract as the media decoders). */
  def pdfTextPlan(
      docs: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id",
      maxStreamBytes: Int = 1 << 26): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        extractPdfText(bytes, maxStreamBytes) match {
          case Some(r) => (id, true, Some(r.pages), Some(r.n_streams),
            Some(r.n_text_streams), Some(r.text))
          case None => (id, false, None, None, None, None)
        }
      }
      .toDF(idCol, "pdf_ok", "pages", "n_streams", "n_text_streams", "text")
  }

  /** `pdf_text(bytes)` / `pdf_pages(bytes)` / `pdf_ok(bytes)` dialect
    * scalars — single shared extraction per projection via Spark
    * subexpression elimination (same pattern as `image_features`). */
  lazy val pdfTextStructCol: Column => Column = {
    val u = udf((b: Array[Byte]) => extractPdfText(b))
    c => u(c)
  }

  /** Hand-built PDF fixture, every byte placed by this code; text and
    * counts are construction literals:
    *   70. two pages; page 1's content FLATE-compressed (Tj chains,
    *       octal escapes, T*, a kerned TJ array), page 2's content RAW
    *       (hex-string Tj), plus a /DCTDecode image stream (counted,
    *       skipped)
    *   71. one page, empty content stream → text ""
    *   72. not a PDF
    *   73. /FlateDecode stream with corrupt deflate bytes → stream
    *       skipped, page count still read from the raw dict. */
  def pdfFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def bytes(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def obj(n: Int, body: String): Array[Byte] = bytes(s"$n 0 obj\n$body\nendobj\n")
    def streamObj(n: Int, dict: String, payload: Array[Byte]): Array[Byte] =
      bytes(s"$n 0 obj\n<< $dict /Length ${payload.length} >>\nstream\n") ++
        payload ++ bytes("\nendstream\nendobj\n")
    val head = bytes("%PDF-1.4\n")
    val tail = bytes("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val catalog = obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    def pageTree(kids: String, count: Int) =
      obj(2, s"<< /Type /Pages /Kids [$kids] /Count $count >>")
    def page(n: Int, content: Int) = obj(n,
      s"<< /Type /Page /Parent 2 0 R /Contents $content 0 R >>")
    val content1 = "BT /F1 12 Tf (Hello) Tj ( ) Tj (World\\050!\\051) Tj T* " +
      "[(Sec) -20 (ond) ( line)] TJ ET"
    val content2 = "BT <48656C6C6F32> Tj ET"
    val v70 = head ++ catalog ++ pageTree("3 0 R 4 0 R", 2) ++
      page(3, 5) ++ page(4, 6) ++
      streamObj(5, "/Filter /FlateDecode", deflate(content1)) ++
      streamObj(6, "", bytes(content2)) ++
      streamObj(7, "/Subtype /Image /Filter /DCTDecode",
        Array[Byte](-1, -40, -1, -32, 1, 2, 3)) ++ tail
    val v71 = head ++ catalog ++ pageTree("3 0 R", 1) ++ page(3, 5) ++
      streamObj(5, "", bytes("")) ++ tail
    val v73 = head ++ catalog ++ pageTree("3 0 R", 1) ++ page(3, 5) ++
      streamObj(5, "/Filter /FlateDecode",
        bytes("this is not deflate data at all")) ++ tail
    Seq(
      70L -> v70,
      71L -> v71,
      72L -> bytes("%PNG not a pdf"),
      73L -> v73
    ).toDF("doc_id", "bytes")
  }
}
