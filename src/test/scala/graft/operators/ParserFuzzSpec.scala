package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Deterministic robustness sweep: every byte-level parser in the engine
  * must REFUSE (None / flagged) on garbage, never throw and never hang —
  * crawled corpora are adversarial by construction, and a single
  * uncaught parse exception fails a whole 100 TB stage. Seeded PRNG:
  * the same inputs every run, so a failure reproduces. */
class ParserFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "probeImage" -> (b => Multimodal.probeImage(b)),
    "probeWav" -> (b => Multimodal.probeWav(b)),
    "probeFlac" -> (b => Multimodal.probeFlac(b)),
    "probeMp3" -> (b => Multimodal.probeMp3(b)),
    "probeMp4Duration" -> (b => Multimodal.probeMp4Duration(b)),
    "mp4Keyframes" -> (b => Multimodal.mp4Keyframes(b)),
    "mp3FrameIndex" -> (b => Multimodal.mp3FrameIndex(b)),
    "flacFrameIndex" -> (b => Multimodal.flacFrameIndex(b)),
    "gifAnimation" -> (b => Multimodal.gifAnimation(b)),
    "decodePixels" -> (b => Multimodal.decodePixels(b)),
    "extractPdfText" -> (b => PdfOps.extractPdfText(b)),
    "zipEntries" -> (b => ArchiveOps.zipEntries(b)),
    "tarEntries" -> (b => ArchiveOps.tarEntries(b)),
    "gunzip" -> (b => ArchiveOps.gunzip(b)),
    "epubSpineXhtml" -> (b => ArchiveOps.epubSpineXhtml(b)),
    "sniffFormat" -> (b => Extract.sniffFormat(b)),
    "parseSubtitles" -> (b =>
      SubtitleOps.parseSubtitles(new String(b,
        java.nio.charset.StandardCharsets.ISO_8859_1))))

  test("random byte arrays: every parser refuses or succeeds, never throws") {
    val rnd = new scala.util.Random(0xF00D)
    val inputs = Vector.tabulate(200) { i =>
      val b = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(b)
      // seed some with real magic prefixes so walks go deeper
      if (i % 10 == 1 && b.length > 8) "%PDF-1.4".getBytes.copyToArray(b, 0)
      if (i % 10 == 2 && b.length > 8)
        Array[Byte]('P', 'K', 3, 4).copyToArray(b, 0)
      if (i % 10 == 3 && b.length > 8)
        Array(0x1f, 0x8b, 8, 0).map(_.toByte).copyToArray(b, 0)
      if (i % 10 == 4 && b.length > 8) "fLaC".getBytes.copyToArray(b, 0)
      if (i % 10 == 5 && b.length > 8) "GIF89a".getBytes.copyToArray(b, 0)
      if (i % 10 == 6 && b.length > 8)
        Array(0xff, 0xfb, 0x90, 0).map(_.toByte).copyToArray(b, 0)
      if (i % 10 == 7 && b.length > 12) {
        Array[Byte](0, 0, 0, 16).copyToArray(b, 0)
        "ftyp".getBytes.copyToArray(b, 4)
      }
      if (i % 10 == 8 && b.length > 10) "WEBVTT\n".getBytes.copyToArray(b, 0)
      b
    } :+ new Array[Byte](0)
    for ((name, p) <- parsers; (b, bi) <- inputs.zipWithIndex) {
      try p(b)
      catch {
        case e: Throwable =>
          fail(s"$name threw on random input #$bi (${b.length} B): $e")
      }
    }
  }

  test("mutated fixtures: bit flips in valid payloads refuse or degrade, " +
      "never throw") {
    val rnd = new scala.util.Random(0xBEEF)
    val fixtures =
      Multimodal.mp3Fixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        Multimodal.flacFixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        Multimodal.gifAnimFixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        Multimodal.mp4Fixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        PdfOps.pdfFixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        ArchiveOps.zipFixture(spark).collect().map(_.getAs[Array[Byte]](1)) ++
        ArchiveOps.tarFixture(spark).collect().map(_.getAs[Array[Byte]](1))
    for (fx <- fixtures; _ <- 1 to 12) {
      val b = fx.clone()
      val flips = 1 + rnd.nextInt(4)
      (1 to flips).foreach { _ =>
        if (b.nonEmpty) {
          val k = rnd.nextInt(b.length)
          b(k) = (b(k) ^ (1 << rnd.nextInt(8))).toByte
        }
      }
      for ((name, p) <- parsers) {
        try p(b)
        catch {
          case e: Throwable => fail(s"$name threw on mutated fixture: $e")
        }
      }
    }
  }

  test("wikiStrip and pdf string scanners terminate on pathological text") {
    val rnd = new scala.util.Random(0xCAFE)
    val pathological = Seq(
      "{{" * 2000, "[[" * 2000, "{|" * 2000, "((((" * 1000, "<" * 4000,
      "''" * 3000, "[[a|" * 1500, "<ref>" * 800, "=" * 4000,
      "\\" * 4000, "$" * 3000, "\\begin{x}" * 800, "{" * 4000,
      "\\href{" * 1000, "\\section{" * 1000, "%" + "a" * 3000,
      Vector.fill(2000)(rnd.nextPrintableChar()).mkString)
    pathological.foreach { s =>
      graft.functions.TextKernels.wikiStrip(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      graft.functions.TextKernels.latexStrip(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      PdfOps.literalString("(" + s + ")", 0)
      PdfOps.hexString("<" + s + ">", 0)
      SubtitleOps.parseSubtitles(s)
    }
  }
}
