package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Scan-based PDF text extraction semantics ([[PdfOps]]). */
class PdfOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixture = PdfOps.pdfFixture(spark).collect()
    .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("pdfFixture extraction: flate + raw streams, escapes, hex, image " +
      "skip, corrupt deflate, non-pdf") {
    val rows = fixture
    val r70 = PdfOps.extractPdfText(rows(70L)).get
    assert(r70 == PdfOps.PdfText(2, 3, 2,
      "Hello World(!)\nSecond line\nHello2"))
    val r71 = PdfOps.extractPdfText(rows(71L)).get
    assert(r71 == PdfOps.PdfText(1, 1, 0, ""))
    assert(PdfOps.extractPdfText(rows(72L)).isEmpty)
    val r73 = PdfOps.extractPdfText(rows(73L)).get
    assert(r73 == PdfOps.PdfText(1, 1, 0, ""))
  }

  test("literal strings: nesting, all escapes, octal, continuation") {
    // nested unescaped parens
    assert(PdfOps.literalString("(a(b)c) rest", 0) == ("a(b)c", 7))
    // escapes incl. octal and escaped parens
    assert(PdfOps.literalString("(x\\n\\t\\(y\\)\\134\\0518)", 0)._1 ==
      "x\n\t(y)\\)8")
    // backslash-newline is a continuation (both EOL conventions)
    assert(PdfOps.literalString("(ab\\\ncd)", 0)._1 == "abcd")
    assert(PdfOps.literalString("(ab\\\r\ncd)", 0)._1 == "abcd")
  }

  test("hex strings: whitespace ignored, odd final digit pads with 0") {
    assert(PdfOps.hexString("<48 65 6C>", 0)._1 == "Hel")
    assert(PdfOps.hexString("<484>", 0)._1 == "H@") // 0x48, 0x40
  }

  test("content routing: no BT means not a text stream; TJ kerning " +
      "numbers are ignored; ' and \" break lines") {
    assert(PdfOps.contentText("q 1 0 0 1 10 10 cm /Im0 Do Q").isEmpty)
    assert(PdfOps.contentText("BT [(a) -120 (b)] TJ ET").contains("ab"))
    assert(PdfOps.contentText("BT (l1) Tj (l2) ' (l3) \" ET")
      .contains("l1\nl2\nl3"))
  }

  test("deflate bomb guard: a stream inflating past the cap is skipped, " +
      "not materialized") {
    // 1 MB of zeros deflates tiny; cap at 1000 output bytes
    val big = new String(new Array[Char](1 << 20))
    val d = new java.util.zip.Deflater()
    d.setInput(big.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val payload = out.toByteArray
    val pdf = ("%PDF-1.4\n3 0 obj\n<< /Type /Page >>\nendobj\n" +
      s"5 0 obj\n<< /Filter /FlateDecode /Length ${payload.length} >>\nstream\n")
      .getBytes("ISO-8859-1") ++ payload ++
      "\nendstream\nendobj\ntrailer\n%%EOF\n".getBytes("ISO-8859-1")
    val r = PdfOps.extractPdfText(pdf, maxStreamBytes = 1000).get
    assert(r == PdfOps.PdfText(1, 1, 0, ""))
    // with an adequate cap the same stream decodes (no text ops → still 0)
    assert(PdfOps.extractPdfText(pdf).get.n_streams == 1)
  }

  test("page census counts a raw stream's dict text exactly once (raw " +
      "bytes are already in the whole-file scan)") {
    val body = "BT (x) Tj ET with a literal /Type /Page inside"
    val pdf = ("%PDF-1.4\n3 0 obj\n<< /Type /Page >>\nendobj\n" +
      s"5 0 obj\n<< /Length ${body.length} >>\nstream\n$body\nendstream\n" +
      "endobj\ntrailer\n%%EOF\n").getBytes("ISO-8859-1")
    val r = PdfOps.extractPdfText(pdf).get
    assert(r.pages == 2) // the real page object + the literal, once each
    assert(r.n_text_streams == 1 && r.text == "x")
  }

  test("pdfTextPlan flags non-PDF rows and keeps the plan distributed") {
    val out = PdfOps.pdfTextPlan(PdfOps.pdfFixture(spark))
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, true, false, true))
    assert(out(0).getString(5) == "Hello World(!)\nSecond line\nHello2")
    assert(out(2).isNullAt(2) && out(2).isNullAt(5))
  }
}
