package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Zip/EPUB ingestion semantics ([[ArchiveOps]]). */
class ArchiveOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixture = ArchiveOps.zipFixture(spark).collect()
    .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("zipEntries: archive-order walk, skim vs keep, refusal on corrupt") {
    val rows = fixture
    val es = ArchiveOps.zipEntries(rows(90L), keep = _.endsWith(".xhtml")).get
    assert(es.map(_.name) == Vector("mimetype", "META-INF/container.xml",
      "OEBPS/content.opf", "OEBPS/ch1.xhtml", "OEBPS/ch2.xhtml",
      "OEBPS/img.png"))
    // kept entries materialize, skimmed ones still count exact sizes
    assert(es.count(_.bytes.isDefined) == 2)
    assert(es.find(_.name == "mimetype").get.size == 20 &&
      es.find(_.name == "mimetype").get.bytes.isEmpty)
    assert(es.find(_.name == "OEBPS/img.png").get.size == 8)
    assert(new String(es.find(_.name == "OEBPS/ch1.xhtml").get.bytes.get,
      "UTF-8").contains("Chapter one"))
    assert(ArchiveOps.zipEntries(rows(92L)).isEmpty)
    assert(ArchiveOps.zipEntries(rows(93L)).isEmpty)
    // bounds refuse loudly
    assert(ArchiveOps.zipEntries(rows(90L), maxEntries = 3).isEmpty)
    assert(ArchiveOps.zipEntries(rows(90L), maxTotalBytes = 100).isEmpty)
    assert(ArchiveOps.zipEntries(rows(90L),
      keep = _ => true, maxEntryBytes = 10).isEmpty)
  }

  test("epubSpineXhtml: OPF spine order beats archive order; plain zips " +
      "fall back to archive order") {
    val rows = fixture
    val s90 = ArchiveOps.epubSpineXhtml(rows(90L)).get
    assert(s90.n_entries == 6 && s90.n_docs == 2)
    assert(s90.xhtml ==
      "<html><body><p>Chapter two text</p></body></html>\n" +
        "<html><body><p>Chapter one text</p></body></html>")
    val s91 = ArchiveOps.epubSpineXhtml(rows(91L)).get
    assert(s91.n_docs == 2 && s91.xhtml == "<p>alpha</p>\n<p>beta</p>")
    assert(ArchiveOps.epubSpineXhtml(rows(92L)).isEmpty)
  }

  test("epubTextPlan: reading-order text through the shared html " +
      "extractor; unreadable rows flag") {
    val out = ArchiveOps.epubTextPlan(ArchiveOps.zipFixture(spark))
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, true, false, false))
    assert(out(0).getString(4) == "Chapter two text\nChapter one text")
    assert(out(1).getString(4) == "alpha\nbeta")
    assert(out(2).isNullAt(4) && out(3).isNullAt(2))
  }

  test("gunzip: multi-member aware, signature-gated, bomb-capped") {
    val rows = ArchiveOps.tarFixture(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(new String(ArchiveOps.gunzip(rows(98L)).get, "UTF-8") ==
      "plain gzip text")
    assert(ArchiveOps.gunzip(rows(99L)).isEmpty) // no signature
    assert(ArchiveOps.gunzip(rows(96L)).isEmpty) // raw tar is not gzip
    assert(ArchiveOps.gunzip(rows(95L), maxBytes = 100).isEmpty) // cap
    // corrupt deflate body behind a valid signature
    val broken = rows(98L).clone()
    broken(broken.length / 2) = (broken(broken.length / 2) ^ 0x55).toByte
    assert(ArchiveOps.gunzip(broken).isEmpty)
    // two concatenated members inflate as one stream (JDK multi-member)
    assert(new String(
      ArchiveOps.gunzip(rows(98L) ++ rows(98L)).get, "UTF-8") ==
      "plain gzip textplain gzip text")
  }

  test("tarEntries: checksum-validated ustar walk, dir/file types, " +
      "keep vs skim, refusal on corruption and truncation") {
    val rows = ArchiveOps.tarFixture(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val tar = rows(96L)
    val es = ArchiveOps.tarEntries(tar, keep = _.endsWith(".txt")).get
    assert(es.map(e => (e.name, e.dir, e.size)) == Vector(
      ("a/", true, 0L), ("a/doc1.txt", false, 9L), ("doc2.txt", false, 5L)))
    assert(new String(es(1).bytes.get, "UTF-8") == "hello tar")
    assert(ArchiveOps.tarEntries(rows(97L)).isEmpty) // checksum mismatch
    assert(ArchiveOps.tarEntries(rows(99L)).isEmpty)
    assert(ArchiveOps.tarEntries(tar, maxEntries = 2).isEmpty)
    assert(ArchiveOps.tarEntries(tar, maxEntryBytes = 4).isEmpty)
    // truncation mid-member refuses rather than inventing a short file
    assert(ArchiveOps.tarEntries(tar.take(512 + 512 + 4)).isEmpty)
    // tar.gz rides the listing plan via signature detection
    val plan = ArchiveOps.tarListPlan(ArchiveOps.tarFixture(spark))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(plan.count(_._1 == 95L) == 3 &&
      plan.filter(_._1 == 95L).forall(_._2))
    assert(plan.filter(_._1 == 97L).map(_._2).toSeq == Seq(false))
    assert(plan.filter(_._1 == 98L).map(_._2).toSeq == Seq(false)) // gzip, not tar
  }

  test("docxText: paragraphs become lines, entities decode, absent " +
      "member and non-zip rows null out") {
    import org.apache.spark.sql.functions._
    val out = ArchiveOps.docxFixture(spark)
      .select(col("doc_id"), ArchiveOps.docxText(col("bytes")).as("t"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "Para one & more\nPara two")
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("archiveExtractPlan explodes matching members across zip, tar " +
      "and tar.gz; empty matches and corrupt archives keep their row") {
    import org.apache.spark.sql.functions._
    val out = ArchiveOps.archiveExtractPlan(
      ArchiveOps.tarFixture(spark), ".*\\.txt", idCol = "doc_id")
      .withColumn("text", decode(col("entry_bytes"), "UTF-8"))
      .orderBy("doc_id", "entry").collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(4)) null else r.getString(4)))
    assert(out.toSeq == Seq(
      (95L, true, "a/doc1.txt", "hello tar"),
      (95L, true, "doc2.txt", "world"),
      (96L, true, "a/doc1.txt", "hello tar"),
      (96L, true, "doc2.txt", "world"),
      (97L, false, null, null),
      (98L, false, null, null), // plain gzip member: not a tar
      (99L, false, null, null)))
    // a zip rides the same plan; a pattern matching nothing keeps the row
    val zips = ArchiveOps.archiveExtractPlan(
      ArchiveOps.zipFixture(spark), ".*\\.xhtml")
      .orderBy("doc_id", "entry").collect()
    assert(zips.count(r => r.getBoolean(1) && !r.isNullAt(2)) == 2) // ch1, ch2
    val none = ArchiveOps.archiveExtractPlan(
      ArchiveOps.zipFixture(spark), "nothing-matches")
      .where(col("doc_id") === 90L).collect()
    assert(none.length == 1 && none(0).getBoolean(1) && none(0).isNullAt(2))
  }

  test("ustar prefix field: paths over 100 chars reassemble as " +
      "prefix/name") {
    val longDir = "very/" + ("deep/" * 22) + "dir" // prefix > 100 chars
    val h = new Array[Byte](512)
    "file.txt".getBytes("US-ASCII").copyToArray(h, 0)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val o = java.lang.Long.toOctalString(v)
      ("0" * (len - 1 - o.length) + o).getBytes("US-ASCII").copyToArray(h, off)
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
    oct(2, 124, 12); oct(0, 136, 12)
    h(156) = '0'.toByte
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    longDir.getBytes("US-ASCII").copyToArray(h, 345)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; h.foreach(x => sum += x & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    ("0" * (6 - cs.length) + cs + "  ").getBytes("ISO-8859-1")
      .copyToArray(h, 148)
    val tar = h ++ "hi".getBytes ++ new Array[Byte](510) ++
      new Array[Byte](1024)
    val es = ArchiveOps.tarEntries(tar).get
    assert(es.map(_.name) == Vector(s"$longDir/file.txt"))
  }

  test("zipCentralNames: names from the central directory with zero " +
      "inflation; malformed tails refuse") {
    val rows = ArchiveOps.zipFixture(spark).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(ArchiveOps.zipCentralNames(rows(90L)).get == Vector(
      "mimetype", "META-INF/container.xml", "OEBPS/content.opf",
      "OEBPS/ch1.xhtml", "OEBPS/ch2.xhtml", "OEBPS/img.png"))
    assert(ArchiveOps.zipCentralNames(rows(92L)).isEmpty) // no EOCD
    assert(ArchiveOps.zipCentralNames(rows(93L)).isEmpty)
    // truncating the central directory refuses rather than mis-listing
    val cut = rows(90L).dropRight(30)
    assert(ArchiveOps.zipCentralNames(cut).isEmpty)
  }

  test("normPath collapses dot segments inside the archive namespace") {
    val deep = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      def put(n: String, d: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(d.getBytes("UTF-8")); zos.closeEntry()
      }
      put("META-INF/container.xml",
        "<rootfile full-path=\"a/b/pkg.opf\"/>")
      put("a/b/pkg.opf", "<item id=\"x\" href=\"../c/./d.xhtml\"/>" +
        "<spine><itemref idref=\"x\"/></spine>")
      put("a/c/d.xhtml", "<p>deep</p>")
      zos.close(); bos.toByteArray
    }
    val s = ArchiveOps.epubSpineXhtml(deep).get
    assert(s.n_docs == 1 && s.xhtml == "<p>deep</p>")
  }
}
