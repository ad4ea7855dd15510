package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Magic-byte sniffing + routed extraction ([[Extract]]). */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def utf8(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("sniffFormat reads signatures, not labels, across every family") {
    def row(df: org.apache.spark.sql.DataFrame, id: Long): Array[Byte] =
      df.collect().find(_.getLong(0) == id).get.getAs[Array[Byte]](1)
    def sniff(b: Array[Byte]) = Extract.sniffFormat(b).get
    assert(sniff(row(PdfOps.pdfFixture(spark), 70L)) == "pdf")
    assert(sniff(row(ArchiveOps.zipFixture(spark), 90L)) == "epub")
    assert(sniff(row(ArchiveOps.zipFixture(spark), 91L)) == "zip")
    assert(sniff(row(ArchiveOps.docxFixture(spark), 94L)) == "docx")
    assert(sniff(row(ArchiveOps.tarFixture(spark), 95L)) == "gzip")
    assert(sniff(row(ArchiveOps.tarFixture(spark), 96L)) == "tar")
    assert(sniff(row(Multimodal.mp3Fixture(spark), 50L)) == "mp3")
    assert(sniff(row(Multimodal.mp4Fixture(spark), 40L)) == "mp4")
    assert(sniff(row(Multimodal.flacFixture(spark), 80L)) == "flac")
    assert(sniff(row(Multimodal.gifAnimFixture(spark), 60L)) == "gif")
    assert(sniff(row(Multimodal.wavPcmFixture(spark), 20L)) == "wav")
    assert(sniff(utf8("WARC/1.0\r\nWARC-Type: response\r\n")) == "warc")
    assert(sniff(utf8("WEBVTT\n\n00:01.000 --> 00:02.000\nx")) == "vtt")
    assert(sniff(utf8("1\n00:00:01,000 --> 00:00:02,000\nx")) == "srt")
    assert(sniff(utf8("<!DOCTYPE html><html><body>hi</body></html>")) == "html")
    assert(sniff(utf8("plain prose, nothing special about it")) == "text")
    assert(sniff(utf8("\\documentclass{article}\\begin{document}hi" +
      "\\end{document}")) == "latex")
    // an html page QUOTING a subtitle timestamp early stays html — the
    // signature check outranks the srt timing heuristic
    assert(sniff(utf8("<html><body>cue 00:00:01,000 --> 00:00:02,000" +
      "</body></html>")) == "html")
    assert(sniff(Array[Byte](0, 1, 2, 3, 4, 5, -1, -2)) == "bin")
    // TIFF magic outranks the mp3 heuristic scan
    assert(sniff(Array[Byte]('I', 'I', 42, 0, 1, 2, 3, 4, 5, 6)) == "tiff")
    // one lone frame-header PATTERN is not mp3 evidence — a chained
    // pair is required (a single pattern matches random binary)
    val lone = new Array[Byte](104)
    Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte).copyToArray(lone, 0)
    assert(sniff(lone) == "bin")
    // a true 2-frame chain still sniffs (fixture row 50)
    assert(sniff(row(Multimodal.mp3Fixture(spark), 52L)) == "mp3")
    assert(Extract.sniffFormat(null).isEmpty)
  }

  test("autoTextPlan: one scan yields the format census AND the routed " +
      "text; textless formats keep their label with null text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def row(df: org.apache.spark.sql.DataFrame, id: Long): Array[Byte] =
      df.collect().find(_.getLong(0) == id).get.getAs[Array[Byte]](1)
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gos = new java.util.zip.GZIPOutputStream(bos)
      gos.write(data); gos.close()
      bos.toByteArray
    }
    val mixed = Seq(
      (1L, utf8("<html><body><p>web page</p></body></html>")),
      (2L, row(PdfOps.pdfFixture(spark), 70L)),
      (3L, row(ArchiveOps.zipFixture(spark), 90L)),
      (4L, row(ArchiveOps.docxFixture(spark), 94L)),
      (5L, utf8("WEBVTT\n\n00:01.000 --> 00:02.000\ncaption line")),
      (6L, gz(utf8("<html><body><p>gzipped page</p></body></html>"))),
      (7L, gz(gz(utf8("double gzip")))), // one-level rule → null text
      (8L, row(Multimodal.mp4Fixture(spark), 40L)), // textless format
      (9L, utf8("plain text stays  itself")),
      (10L, utf8("\\documentclass{article}\\begin{document}" +
        "\\section{A}body text $x$\\end{document}")))
      .toDF("doc_id", "bytes")
    val out = Extract.autoTextPlan(mixed).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out(0) == ((1L, "html", Some("web page"))))
    assert(out(1) == ((2L, "pdf",
      Some("Hello World(!)\nSecond line\nHello2"))))
    assert(out(2) == ((3L, "epub",
      Some("Chapter two text\nChapter one text"))))
    assert(out(3) == ((4L, "docx", Some("Para one & more\nPara two"))))
    assert(out(4) == ((5L, "vtt", Some("caption line"))))
    assert(out(5) == ((6L, "gzip", Some("gzipped page"))))
    assert(out(6) == ((7L, "gzip", None)))
    assert(out(7) == ((8L, "mp4", None)))
    assert(out(8) == ((9L, "text", Some("plain text stays itself"))))
    assert(out(9) == ((10L, "latex", Some("A\nbody text"))))
  }
}
