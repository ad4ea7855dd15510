package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded serialize∘parse round-trip properties — the strongest cheap
  * correctness evidence for container walks: if a conformant writer's
  * output always reads back exactly, the reader's framing arithmetic is
  * right everywhere, not just on the hand-built fixtures (the WARC
  * source carries the same property in q_warc_ingest). */
class RoundTripSpec extends AnyFunSuite {

  private def rnd = new scala.util.Random(0x5EED)

  test("zip: JDK-written archives of random entries read back " +
      "name/size/byte-exact in archive order") {
    val r = rnd
    (1 to 20).foreach { _ =>
      val entries = Vector.tabulate(1 + r.nextInt(8)) { k =>
        val name = s"dir${r.nextInt(3)}/f$k-${r.alphanumeric.take(6).mkString}"
        val data = new Array[Byte](r.nextInt(5000))
        r.nextBytes(data)
        name -> data
      }
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, d) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(d); zos.closeEntry()
      }
      zos.close()
      val back = ArchiveOps.zipEntries(bos.toByteArray).get
      assert(back.map(_.name) == entries.map(_._1))
      back.zip(entries).foreach { case (e, (_, d)) =>
        assert(e.size == d.length)
        assert(java.util.Arrays.equals(e.bytes.get, d))
      }
    }
  }

  test("tar: spec-conformant headers (the fixture writer) read back " +
      "exactly, including block padding edges") {
    val r = rnd
    def header(name: String, size: Long): Array[Byte] = {
      val h = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(h, 0)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val o = java.lang.Long.toOctalString(v)
        ("0" * (len - 1 - o.length) + o).getBytes("US-ASCII").copyToArray(h, off)
      }
      oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
      oct(size, 124, 12); oct(0, 136, 12)
      h(156) = '0'.toByte
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L; h.foreach(x => sum += x & 0xff)
      val cs = java.lang.Long.toOctalString(sum)
      ("0" * (6 - cs.length) + cs + "  ").getBytes("ISO-8859-1")
        .copyToArray(h, 148)
      h
    }
    (1 to 20).foreach { _ =>
      // sizes deliberately hit the 512-block edges (0, 511, 512, 513)
      val sizes = Vector.fill(1 + r.nextInt(6))(
        Seq(0, 1, 511, 512, 513, r.nextInt(4000))(r.nextInt(6)))
      val entries = sizes.zipWithIndex.map { case (sz, k) =>
        val d = new Array[Byte](sz); r.nextBytes(d); s"m$k.bin" -> d
      }
      val tar = entries.toArray.flatMap { case (n, d) =>
        header(n, d.length) ++ d ++
          new Array[Byte]((512 - d.length % 512) % 512)
      } ++ new Array[Byte](1024)
      val back = ArchiveOps.tarEntries(tar).get
      assert(back.map(e => (e.name, e.size)) ==
        entries.map { case (n, d) => (n, d.length.toLong) })
      back.zip(entries).foreach { case (e, (_, d)) =>
        assert(java.util.Arrays.equals(e.bytes.get, d))
      }
    }
  }

  test("srt: formatted cues parse back to identical times and text") {
    val r = rnd
    def fmt(ms: Long): String = "%02d:%02d:%02d,%03d".format(
      ms / 3600000, ms / 60000 % 60, ms / 1000 % 60, ms % 1000)
    (1 to 20).foreach { _ =>
      val cues = Vector.tabulate(1 + r.nextInt(10)) { k =>
        val start = k * 10000L + r.nextInt(5000)
        val end = start + 1 + r.nextInt(4000)
        val text = Vector.fill(1 + r.nextInt(3))(
          r.alphanumeric.take(1 + r.nextInt(20)).mkString).mkString("\n")
        (start, end, text)
      }
      val srt = cues.zipWithIndex.map { case ((s, e, t), k) =>
        s"${k + 1}\n${fmt(s)} --> ${fmt(e)}\n$t\n"
      }.mkString("\n")
      val back = SubtitleOps.parseSubtitles(srt).get
      assert(back.map(c => (c.start_ms, c.end_ms, c.text)) == cues)
      assert(back.map(_.cue) == (1 to cues.length).toVector)
    }
  }

  test("gzip: gunzip inverts GZIPOutputStream for random payloads") {
    val r = rnd
    (1 to 20).foreach { _ =>
      val d = new Array[Byte](r.nextInt(50000))
      r.nextBytes(d)
      val bos = new java.io.ByteArrayOutputStream()
      val gos = new java.util.zip.GZIPOutputStream(bos)
      gos.write(d); gos.close()
      assert(java.util.Arrays.equals(
        ArchiveOps.gunzip(bos.toByteArray).get, d))
    }
  }
}
