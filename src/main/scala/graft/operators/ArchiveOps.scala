package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zip-archive ingestion via the JDK's own `ZipInputStream` — no
  * external library, the same no-new-dependency stance as
  * [[PdfOps]]/[[Multimodal]]. Zip is the container under EPUB (books
  * corpora), DOCX, and plain `.zip` bundles of pages; the operators here
  * surface (1) a bounded entry LISTING and (2) EPUB/bundle text via the
  * spine-ordered XHTML concatenation, with the actual HTML→text step
  * delegated to [[HtmlOps.extractText]] so there is exactly ONE
  * extraction implementation (and its oracle) in the engine.
  *
  * Bomb posture: every walk is bounded — entry count, per-kept-entry
  * bytes, and TOTAL inflated bytes (skimmed entries are drained counted,
  * never materialized); exceeding any bound refuses the whole archive
  * loudly (None), the same refuse-don't-guess contract as the media
  * probes. */
object ArchiveOps {

  /** One walked entry: name, directory flag, UNCOMPRESSED size (counted
    * from the inflate, deterministic — declared sizes can lie), and the
    * bytes when the caller's `keep` predicate selected the entry. */
  case class ZipEntryData(
      name: String, dir: Boolean, size: Long, bytes: Option[Array[Byte]])

  /** Walk a zip byte array in archive order. `keep` selects which
    * entries to materialize; the rest are drained to count their
    * inflated size. None for a non-zip signature, corrupt archive, or
    * any exceeded bound. */
  def zipEntries(
      b: Array[Byte],
      keep: String => Boolean = _ => true,
      maxEntries: Int = 10000,
      maxEntryBytes: Int = 1 << 26,
      maxTotalBytes: Long = 1L << 28): Option[Vector[ZipEntryData]] = {
    if (b == null || b.length < 4 ||
        !(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val out = Vector.newBuilder[ZipEntryData]
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = 0
      var e = zis.getNextEntry
      while (e != null) {
        n += 1
        if (n > maxEntries) return None
        if (e.isDirectory) out += ZipEntryData(e.getName, dir = true, 0L, None)
        else {
          val wanted = keep(e.getName)
          val bos = if (wanted) new java.io.ByteArrayOutputStream() else null
          var size = 0L
          var r = zis.read(buf)
          while (r > 0) {
            size += r
            total += r
            if (total > maxTotalBytes) return None
            if (wanted) {
              if (size > maxEntryBytes) return None
              bos.write(buf, 0, r)
            }
            r = zis.read(buf)
          }
          out += ZipEntryData(e.getName, dir = false, size,
            if (wanted) Some(bos.toByteArray) else None)
        }
        e = zis.getNextEntry
      }
      Some(out.result())
    } catch {
      case _: java.util.zip.ZipException | _: java.io.IOException |
          _: IllegalArgumentException => None // corrupt framing / bad names
    } finally zis.close()
  }

  /** Entry NAMES from the zip CENTRAL DIRECTORY — pure byte arithmetic
    * at the end of the archive, nothing inflated: the sniffing path's
    * way to refine zip → epub/docx without paying a decompression walk
    * over every member. None for a malformed/absent end-of-central-
    * directory record or zip64 markers (the caller falls back to the
    * generic label, never to garbage). */
  private[graft] def zipCentralNames(
      b: Array[Byte], maxEntries: Int = 10000): Option[Vector[String]] = {
    if (b == null || b.length < 22) return None
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (le16(i).toLong | (le16(i + 2).toLong << 16)) & 0xffffffffL
    var e = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (e >= stop && !(b(e) == 'P' && b(e + 1) == 'K' &&
        u8(e + 2) == 5 && u8(e + 3) == 6)) e -= 1
    if (e < stop) return None
    val n = le16(e + 10)
    val cdOff = le32(e + 16)
    if (n == 0xffff || cdOff == 0xffffffffL) return None // zip64
    if (n > maxEntries) return None
    var p = cdOff.toInt
    if (p < 0 || p >= b.length) return None
    val out = Vector.newBuilder[String]
    var k = 0
    while (k < n) {
      if (p + 46 > b.length || !(b(p) == 'P' && b(p + 1) == 'K' &&
          u8(p + 2) == 1 && u8(p + 3) == 2)) return None
      val nameLen = le16(p + 28)
      val extraLen = le16(p + 30)
      val cmtLen = le16(p + 32)
      if (p + 46 + nameLen > b.length) return None
      out += new String(b, p + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      p += 46 + nameLen + extraLen + cmtLen
      k += 1
    }
    Some(out.result())
  }

  /** Entry listing over a (id, bytes) table — (idCol, zip_ok, entry,
    * is_dir, size), one row per entry, nothing materialized (every
    * entry is skimmed); unreadable archives flag, never drop. */
  def zipListPlan(
      df: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id"): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        zipEntries(bytes, keep = _ => false) match {
          case Some(es) if es.nonEmpty =>
            es.map(e => (id, true, Some(e.name), Some(e.dir), Some(e.size)))
          case Some(_) => Seq((id, true, None, None, None)) // empty archive
          case None => Seq((id, false, None, None, None))
        }
      }
      .toDF(idCol, "zip_ok", "entry", "is_dir", "size")
  }

  /** EXPLODE an archive column into (id, entry, bytes) rows for the
    * entries whose names match `namePattern` (a Java regex, full
    * match) — the corpus shape: one tar.gz/zip of documents in, one row
    * per member document out, ready for [[Extract.autoTextPlan]] or any
    * per-document operator. Unreadable archives and archives with no
    * matching member both yield a single flagged/empty row so the audit
    * never loses an input row. gzip-wrapped tars are signature-detected
    * like [[tarListPlan]]. */
  def archiveExtractPlan(
      df: DataFrame,
      namePattern: String,
      bytesCol: String = "bytes",
      idCol: String = "doc_id",
      maxEntryBytes: Int = 1 << 26,
      maxGzipBytes: Int = 1 << 28): DataFrame = {
    import df.sparkSession.implicits._
    // Pattern is Serializable: compile once, ship compiled
    val p = java.util.regex.Pattern.compile(namePattern)
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        def keep(n: String) = p.matcher(n).matches()
        val es: Option[Vector[ZipEntryData]] =
          if (bytes != null && bytes.length > 3 && bytes(0) == 'P' &&
              bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4)
            zipEntries(bytes, keep, maxEntryBytes = maxEntryBytes)
          else {
            val raw =
              if (bytes != null && bytes.length > 2 &&
                  (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
                gunzip(bytes, maxGzipBytes)
              else Option(bytes)
            raw.flatMap(r =>
              tarEntries(r, keep, maxEntryBytes = maxEntryBytes))
          }
        es match {
          case Some(entries) =>
            val kept = entries.filter(_.bytes.isDefined)
            if (kept.isEmpty) Seq((id, true, None, None))
            else kept.map(e => (id, true, Some(e.name), e.bytes))
          case None => Seq((id, false, None, None))
        }
      }
      .toDF(idCol, "archive_ok", "entry", "entry_bytes")
  }

  /** Spine resolution result: entry count, how many documents feed the
    * text, and their XHTML joined in reading order (to be fed to
    * [[HtmlOps.extractText]]). */
  case class EpubSpine(n_entries: Int, n_docs: Int, xhtml: String)

  private val fullPathPat =
    java.util.regex.Pattern.compile("full-path\\s*=\\s*[\"']([^\"']+)[\"']")
  private val itemPat = java.util.regex.Pattern.compile("<item\\b[^>]*>")
  private val itemrefPat = java.util.regex.Pattern.compile("<itemref\\b[^>]*>")
  private def attr(tag: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile(name + "\\s*=\\s*[\"']([^\"']+)[\"']").matcher(tag)
    if (m.find()) Some(m.group(1)) else None
  }
  private def normPath(p: String): String =
    p.split('/').foldLeft(List.empty[String]) {
      case (acc, "..") => if (acc.nonEmpty) acc.tail else acc
      case (acc, ".") => acc
      case (acc, "") => acc
      case (acc, s) => s :: acc
    }.reverse.mkString("/")

  /** EPUB (or zip-of-pages) → reading-order XHTML: resolves
    * `META-INF/container.xml` → the OPF's manifest + spine and joins
    * the spine documents with '\n'; an archive WITHOUT an OPF falls
    * back to its `.xhtml/.html/.htm` entries in archive order (a plain
    * zip of crawled pages rides the same operator). Lenient by design:
    * the `mimetype` entry is not required (many real EPUBs get it
    * wrong); href percent-encoding is not decoded (disclosed). None
    * only when the archive itself is unreadable. */
  def epubSpineXhtml(b: Array[Byte]): Option[EpubSpine] = {
    def isDoc(n: String) = {
      val l = n.toLowerCase(java.util.Locale.ROOT)
      l.endsWith(".xhtml") || l.endsWith(".html") || l.endsWith(".htm")
    }
    def isKept(n: String) = isDoc(n) ||
      n == "META-INF/container.xml" ||
      n.toLowerCase(java.util.Locale.ROOT).endsWith(".opf")
    zipEntries(b, keep = isKept).map { es =>
      val files = es.filter(e => !e.dir)
      val byName = files.collect {
        case e if e.bytes.isDefined =>
          e.name -> new String(e.bytes.get,
            java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
      val spineNames: Seq[String] = (for {
        container <- byName.get("META-INF/container.xml")
        opfPath <- { val m = fullPathPat.matcher(container)
          if (m.find()) Some(m.group(1)) else None }
        opf <- byName.get(normPath(opfPath))
      } yield {
        val dir = normPath(opfPath).lastIndexOf('/') match {
          case -1 => ""
          case i => normPath(opfPath).substring(0, i + 1)
        }
        val idToHref = {
          val m = itemPat.matcher(opf)
          val pairs = Iterator.continually(m)
            .takeWhile(_.find()).map(_.group(0))
            .flatMap(t => for (i <- attr(t, "id"); h <- attr(t, "href"))
              yield i -> h)
            .toList
          pairs.toMap
        }
        val m = itemrefPat.matcher(opf)
        Iterator.continually(m).takeWhile(_.find()).map(_.group(0))
          .flatMap(t => attr(t, "idref"))
          .flatMap(idToHref.get)
          .map(h => normPath(dir + h))
          .toList
      }).getOrElse(Nil)
      val docNames =
        if (spineNames.nonEmpty) spineNames.filter(byName.contains)
        else files.collect { case e if isDoc(e.name) => e.name }
      val docs = docNames.flatMap(byName.get)
      EpubSpine(files.length, docs.length, docs.mkString("\n"))
    }
  }

  /** `epub_struct(bytes)` → struct(n_entries, n_docs, xhtml); NULL for
    * an unreadable archive. Compose `epub_text` as
    * `HtmlOps.extractText(...getField("xhtml"))` — one extractor. */
  lazy val epubSpineCol: Column => Column = {
    val u = udf((b: Array[Byte]) => epubSpineXhtml(b))
    c => u(c)
  }

  /** Extracted reading-order text of an EPUB/zip-of-pages column. */
  def epubText(bytes: Column): Column =
    HtmlOps.extractText(epubSpineCol(bytes).getField("xhtml"))

  /** Extraction over a (id, bytes) table — (idCol, epub_ok, n_entries,
    * n_docs, text); the HTML→text step runs as the SAME Catalyst
    * expression chain as [[HtmlOps.extractText]] everywhere else. */
  def epubTextPlan(
      df: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id"): DataFrame = {
    val s = epubSpineCol(col(bytesCol))
    df.select(
      col(idCol).cast("long").as(idCol),
      s.isNotNull.as("epub_ok"),
      s.getField("n_entries").as("n_entries"),
      s.getField("n_docs").as("n_docs"),
      when(s.isNotNull, HtmlOps.extractText(s.getField("xhtml"))).as("text"))
  }

  // ------------------------------------------------------------ docx

  /** The `word/document.xml` member of a DOCX (OOXML zip), as a string;
    * NULL when the archive is unreadable or the member is absent. */
  lazy val docxXmlCol: Column => Column = {
    val u = udf((b: Array[Byte]) =>
      zipEntries(b, keep = _ == "word/document.xml").flatMap(
        _.find(_.name == "word/document.xml").flatMap(_.bytes)
          .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))))
    c => u(c)
  }

  /** DOCX → text: paragraph closes (`</w:p>`) become line breaks, then
    * the shared HTML extractor chain strips the remaining XML tags and
    * decodes entities. Scope disclosed: text outside `<w:t>` runs that
    * is still element text (field instructions, deleted-tracked runs)
    * is not filtered — the scan-path tradeoff, same spirit as
    * [[PdfOps]]. */
  def docxText(bytes: Column): Column =
    HtmlOps.extractText(
      regexp_replace(docxXmlCol(bytes), "</w:p>", "\n"))

  /** DOCX fixture:
    *   94. two paragraphs (one with an XML entity) in the OOXML layout
    *   95. a zip without `word/document.xml`
    *   96. not a zip. */
  def docxFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    def s(x: String) = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def zip(entries: (String, Array[Byte])*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (name, data) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(data)
        zos.closeEntry()
      }
      zos.close()
      bos.toByteArray
    }
    val doc = "<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r><w:t>Para one &amp; more</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>Para two</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    Seq(
      94L -> zip("[Content_Types].xml" -> s("<Types/>"),
        "word/document.xml" -> s(doc)),
      95L -> zip("other.txt" -> s("nope")),
      96L -> s("not a zip")
    ).toDF("doc_id", "bytes")
  }

  // ------------------------------------------------------------ gzip

  /** Inflate one gzip byte array (multi-member streams per the JDK's
    * GZIPInputStream). None for a non-gzip signature, corrupt stream, or
    * inflated output past `maxBytes` (bomb guard — one bounded buffer,
    * never the executor). */
  def gunzip(b: Array[Byte], maxBytes: Int = 1 << 28): Option[Array[Byte]] = {
    if (b == null || b.length < 3 || (b(0) & 0xff) != 0x1f ||
        (b(1) & 0xff) != 0x8b) return None
    try {
      val gis = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream(math.min(maxBytes, 1 << 16))
        val buf = new Array[Byte](8192)
        var r = gis.read(buf)
        while (r > 0) {
          out.write(buf, 0, r)
          if (out.size() > maxBytes) return None
          r = gis.read(buf)
        }
        Some(out.toByteArray)
      } finally gis.close()
    } catch {
      case _: java.util.zip.ZipException | _: java.io.IOException => None
    }
  }

  /** `gunzip(bytes)` → inflated bytes, NULL for non-gzip/corrupt input. */
  lazy val gunzipCol: Column => Column = {
    val u = udf((b: Array[Byte]) => gunzip(b))
    c => u(c)
  }

  /** `gunzip_text(bytes)` → inflated bytes decoded as UTF-8 — the
    * compressed-text-payload shape (gzip WARC/JSONL members). */
  def gunzipText(bytes: Column): Column = decode(gunzipCol(bytes), "UTF-8")

  // ------------------------------------------------------------- tar

  /** Walk a tar (ustar/pre-POSIX) byte array: 512-byte headers, octal
    * sizes, content padded to block alignment. Same keep/skim + bound
    * semantics as [[zipEntries]]; for `.tar.gz` compose with [[gunzip]].
    * The walk stops at the end-of-archive zero block; a malformed header
    * refuses (None) — tar has no magic at offset 0, so the all-zero and
    * checksum fields are the validity signal. */
  def tarEntries(
      b: Array[Byte],
      keep: String => Boolean = _ => true,
      maxEntries: Int = 10000,
      maxEntryBytes: Int = 1 << 26): Option[Vector[ZipEntryData]] = {
    if (b == null || b.length < 512) return None
    def str(off: Int, len: Int): String = {
      var e = off
      val lim = off + len
      while (e < lim && b(e) != 0) e += 1
      new String(b, off, e - off, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def octal(off: Int, len: Int): Long = {
      val s = str(off, len).trim
      if (s.isEmpty) 0L
      else try java.lang.Long.parseLong(s, 8)
      catch { case _: NumberFormatException => -1L }
    }
    val out = Vector.newBuilder[ZipEntryData]
    var p = 0
    var n = 0
    while (p + 512 <= b.length) {
      if (b(p) == 0) {
        // end-of-archive zero block: require it actually be all zero
        var z = p
        val lim = math.min(p + 512, b.length)
        while (z < lim && b(z) == 0) z += 1
        return if (z == lim) Some(out.result()) else None
      }
      n += 1
      if (n > maxEntries) return None
      // POSIX ustar splits paths over 100 chars: prefix field (155 B at
      // +345) + '/' + name — ignoring it would strip deep directories
      // and collide distinct members onto one name
      val name0 = str(p, 100)
      val name =
        if (b.length >= p + 350 && str(p + 257, 5) == "ustar" &&
            b(p + 345) != 0) str(p + 345, 155) + "/" + name0
        else name0
      val size = octal(p + 124, 12)
      val typ = b(p + 156).toChar
      // header checksum: bytes sum with the checksum field as spaces
      val declared = octal(p + 148, 8)
      var sum = 0L
      var k = p
      while (k < p + 512) {
        sum += (if (k >= p + 148 && k < p + 156) ' '.toInt else b(k) & 0xff)
        k += 1
      }
      if (size < 0 || declared != sum) return None
      val dir = typ == '5' || name.endsWith("/")
      val dataEnd = p + 512 + size
      if (dataEnd > b.length) return None // truncated member
      if (dir) out += ZipEntryData(name, dir = true, 0L, None)
      else {
        val wanted = keep(name) && typ != '1' && typ != '2' // not link types
        if (wanted && size > maxEntryBytes) return None
        out += ZipEntryData(name, dir = false, size,
          if (wanted)
            Some(java.util.Arrays.copyOfRange(b, p + 512, dataEnd.toInt))
          else None)
      }
      p = (dataEnd + 511).toInt / 512 * 512
    }
    Some(out.result()) // no terminator block: tolerated at end-of-buffer
  }

  /** First-header checksum validity — the tar SNIFF signal (pre-POSIX
    * tars have no magic; the spec's spaces-for-checksum sum over block 0
    * is the reliable tell). */
  private[graft] def tarFirstHeader(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 512 || b(0) == 0) return false
    val cs = new String(b, 148, 8,
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .takeWhile(c => c != 0 && c != ' ').trim
    val declared =
      try java.lang.Long.parseLong(cs, 8)
      catch { case _: NumberFormatException => return false }
    var sum = 0L
    var k = 0
    while (k < 512) {
      sum += (if (k >= 148 && k < 156) ' '.toInt else b(k) & 0xff)
      k += 1
    }
    declared == sum
  }

  /** Entry listing over a (id, bytes) table of tar or tar.gz archives —
    * gzip members inflate first (signature-detected); same shape as
    * [[zipListPlan]]. */
  def tarListPlan(
      df: DataFrame,
      bytesCol: String = "bytes",
      idCol: String = "doc_id",
      maxGzipBytes: Int = 1 << 28): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val raw =
          if (bytes != null && bytes.length > 2 && (bytes(0) & 0xff) == 0x1f &&
              (bytes(1) & 0xff) == 0x8b) gunzip(bytes, maxGzipBytes)
          else Option(bytes)
        raw.flatMap(r => tarEntries(r, keep = _ => false)) match {
          case Some(es) if es.nonEmpty =>
            es.map(e => (id, true, Some(e.name), Some(e.dir), Some(e.size)))
          case Some(_) => Seq((id, true, None, None, None))
          case None => Seq((id, false, None, None, None))
        }
      }
      .toDF(idCol, "tar_ok", "entry", "is_dir", "size")
  }

  /** Zip/EPUB fixture — archives built entry-by-entry with the JDK's
    * own ZipOutputStream; contents are construction literals:
    *   90. a well-formed EPUB: mimetype, container.xml → OPF whose
    *       SPINE ORDERS ch2 BEFORE ch1 (reading order must beat archive
    *       order), two XHTML chapters, and a binary image entry that is
    *       skimmed, never materialized
    *   91. a plain zip of two HTML pages (no OPF) → archive-order
    *       fallback
    *   92. a PK signature followed by garbage → refused
    *   93. not a zip at all. */
  def zipFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    def zip(entries: (String, Array[Byte])*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (name, data) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(data)
        zos.closeEntry()
      }
      zos.close()
      bos.toByteArray
    }
    def s(x: String) = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val container = "<?xml version=\"1.0\"?><container><rootfiles>" +
      "<rootfile full-path=\"OEBPS/content.opf\"/></rootfiles></container>"
    val opf = "<package><manifest>" +
      "<item id=\"c1\" href=\"ch1.xhtml\"/>" +
      "<item id=\"c2\" href=\"ch2.xhtml\"/>" +
      "<item id=\"im\" href=\"img.png\"/></manifest>" +
      "<spine><itemref idref=\"c2\"/><itemref idref=\"c1\"/></spine></package>"
    val ch1 = "<html><body><p>Chapter one text</p></body></html>"
    val ch2 = "<html><body><p>Chapter two text</p></body></html>"
    val epub = zip(
      "mimetype" -> s("application/epub+zip"),
      "META-INF/container.xml" -> s(container),
      "OEBPS/content.opf" -> s(opf),
      "OEBPS/ch1.xhtml" -> s(ch1),
      "OEBPS/ch2.xhtml" -> s(ch2),
      "OEBPS/img.png" -> Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val pages = zip(
      "a.html" -> s("<p>alpha</p>"),
      "b.html" -> s("<p>beta</p>"))
    Seq(
      90L -> epub,
      91L -> pages,
      92L -> ("PK\u0003\u0004 then garbage that is not a zip record"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      93L -> s("just some text")
    ).toDF("doc_id", "bytes")
  }

  /** tar / tar.gz / gzip fixture — headers hand-placed (ustar layout,
    * checksum computed the spec's way: checksum field as spaces):
    *   95. tar.gz: a directory entry + two files, gzipped
    *   96. the same tar uncompressed
    *   97. the same tar with one checksum byte corrupted → refused
    *   98. a plain gzip text member (valid gzip, not a tar)
    *   99. not gzip and not tar. */
  def tarFixture(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    def s(x: String) = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def header(name: String, size: Long, typ: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(h, 0)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val o = java.lang.Long.toOctalString(v)
        ("0" * (len - 1 - o.length) + o).getBytes("US-ASCII").copyToArray(h, off)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8) // uid/gid
      oct(size, 124, 12)
      oct(0, 136, 12) // mtime
      h(156) = typ.toByte
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(x => sum += x & 0xff)
      val cs = java.lang.Long.toOctalString(sum)
      ("0" * (6 - cs.length) + cs + "  ")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        .copyToArray(h, 148)
      h
    }
    def file(name: String, data: Array[Byte]): Array[Byte] = {
      val pad = (512 - data.length % 512) % 512
      header(name, data.length, '0') ++ data ++ new Array[Byte](pad)
    }
    val tar = header("a/", 0, '5') ++
      file("a/doc1.txt", s("hello tar")) ++
      file("doc2.txt", s("world")) ++
      new Array[Byte](1024) // end-of-archive zero blocks
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gos = new java.util.zip.GZIPOutputStream(bos)
      gos.write(data); gos.close()
      bos.toByteArray
    }
    val corrupt = tar.clone()
    corrupt(148) = '7' // first checksum digit of the dir header
    Seq(
      95L -> gz(tar),
      96L -> tar,
      97L -> corrupt,
      98L -> gz(s("plain gzip text")),
      99L -> s("neither gzip nor tar, and shorter than a block")
    ).toDF("doc_id", "bytes")
  }
}
