package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Doc-example pinning suite — mirrors the reference's doc-cases e2e file
  * (reference: test/e2e/doc_cases_test.go:11-14), which executes every SQL
  * example from the public docs so documentation drift breaks CI before it
  * reaches a user. Here: the README.md Usage example plus the five
  * doc-collection cases the reference pins (filter/transform grading,
  * stream-table enrichment, global-lag CDC, OVER-WHEN-limited lag, and the
  * four window-SQL shapes). Any change that breaks one of these SQL
  * strings breaks a published example.
  */
class DocCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("README usage example: enrichment join + tumbling window aggregate") {
    val ss = StreamSql(spark)
    // 3 readings for d1 inside one 5s window, 1 for d2; ts is epoch-ms
    ss.registerTable("stream", Seq(
      ("d1", 20.0, 1000L), ("d1", 22.0, 2000L), ("d1", 24.0, 3000L),
      ("d2", 30.0, 2500L), ("d3", -5.0, 2600L) // d3 filtered by WHERE
    ).toDF("deviceId", "temperature", "ts"))
    ss.registerTable("meta", Seq(("d1", "plantA"), ("d2", "plantB"), ("d3", "plantC"))
      .toDF("deviceId", "site"))
    val out = ss.execute("""
      SELECT deviceId, avg(temperature) AS t, window_start() AS ws
      FROM stream JOIN meta m ON deviceId = m.deviceId
      WHERE temperature > 0
      GROUP BY deviceId, TumblingWindow('5s')
      WITH (TIMESTAMP='ts', TIMEUNIT='ms', MAXOUTOFORDERNESS='2s')""")
    val rows = out.collect().map(r =>
      (r.getAs[String]("deviceId"), r.getAs[Double]("t"), r.getAs[Long]("ws"))).toSet
    assert(rows == Set(("d1", 22.0, 0L), ("d2", 30.0, 0L)))
  }

  test("README web-curation example: html → text → link gate → curate") {
    import graft.operators._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val a = "the quick analysis shows that the data is clear and the " +
      "method works with care and the outcome is strong "
    val b = "the long report says that the work is done and the result " +
      "is final with notes and the summary is short "
    def page(i: Long, body: String) =
      (i, s"<html><head><title>p$i</title></head><body><p>$body</p></body></html>")
    val crawl = Seq(
      page(1L, a * 2 + "unique one extra tail words here"),
      page(2L, a * 2 + "unique one extra tail words here"), // near-dup of 1
      page(3L, b * 2 + "completely different closing thoughts"),
      (4L, "<html><body><p>nav</p><a href=\"/a\">home</a> " +
        "<a href=\"/b\">about</a> <a href=\"/c\">contact</a></body></html>")
    ).toDF("doc_id", "html")
    // the README example, verbatim
    val pages = HtmlOps.htmlStats(crawl)
    val docs = pages
      .filter(col("link_density") < 0.5)
      .select(col("doc_id"), col("text_extracted").as("text"))
    val kept = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(4L), "link-density gate must drop the nav page")
    assert(kept.intersect(Set(1L, 2L)).size == 1, s"near-dups must collapse: $kept")
    assert(kept.contains(3L), s"distinct doc must survive: $kept")
    // the one-call front door must agree with the hand-composed pipeline,
    // and a canonical-URL refetch (same page, tracking param) must
    // collapse BEFORE text dedup when a url column is present
    val crawl2 = crawl
      .withColumn("url", concat(lit("https://s.com/p"), col("doc_id")))
      .union(Seq((5L, crawl.filter(col("doc_id") === 3L).head().getString(1)))
        .toDF("doc_id", "html")
        .withColumn("url", lit("https://s.com/p3?utm_source=x")))
    val keptWeb = Curation.curateWeb(crawl2)
      .select("doc_id").as[Long].collect().toSet
    assert(keptWeb == kept, s"curateWeb $keptWeb vs composed $kept")
  }

  test("training-side pipeline end-to-end: train → vocab → ids → pack → shard") {
    // the tokenizer-side curateWeb analog: the full chain a trainer
    // consumes, pinned against a hand-computed layout on Sennrich et
    // al.'s worked corpus split across four documents
    import graft.operators.{Bpe, Packing}
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, 5)
    assert(m == Seq("e" -> "s", "es" -> "t", "est" -> "</w>",
      "l" -> "o", "lo" -> "w"))
    val v = Bpe.vocab(docs, m)
    // <unk>, alphabet d e i l n o r s t w (1..10), </w>=11, then products
    assert(v == Seq("<unk>", "d", "e", "i", "l", "n", "o", "r", "s", "t", "w",
      "</w>", "es", "est", "est</w>", "lo", "low"))
    val ids = Bpe.tokenizeIds(docs, m, v).select(col("doc_id"), col("token_ids"))
    val byDoc = ids.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val low = Seq(16, 11); val lower = Seq(16, 2, 7, 11)
    val newest = Seq(5, 2, 10, 14); val widest = Seq(10, 3, 1, 14)
    assert(byDoc(1L) == Seq.fill(5)(low).flatten)
    assert(byDoc(2L) == Seq.fill(2)(lower).flatten)
    assert(byDoc(3L) == Seq.fill(6)(newest).flatten)
    assert(byDoc(4L) == Seq.fill(3)(widest).flatten)
    // pack at budget 20, one stream: [d1(10) d2(8)] | [d3(24) overlong] |
    // [d4(12)]; then shard the sequences 2 ways by the portable id hash
    val packed = Packing.emitPackedIds(ids, budget = 20, buckets = 1)
    val sharded = Packing.shardForTraining(packed, shards = 2, idCol = "seq_id")
      .orderBy("seq_id").collect()
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val expShard = Seq(0L, 1L, 2L).map(i => i -> (h60(i.toString) % 2).toInt).toMap
    val expPos = Seq(0L, 1L, 2L).groupBy(expShard)
      .flatMap { case (_, seqs) =>
        seqs.sortBy(i => (h60(i.toString), i)).zipWithIndex }
    assert(sharded.length == 3)
    val rows = sharded.map(r => (r.getLong(r.fieldIndex("seq_id")),
      r.getLong(r.fieldIndex("n_docs")), r.getInt(r.fieldIndex("n_tokens")),
      r.getSeq[Int](r.fieldIndex("doc_lens")), r.getSeq[Int](r.fieldIndex("doc_starts")),
      r.getSeq[Int](r.fieldIndex("token_ids")),
      r.getInt(r.fieldIndex("shard")), r.getLong(r.fieldIndex("shard_pos"))))
    assert(rows(0) == ((0L, 2L, 18, Seq(10, 8), Seq(0, 10),
      Seq.fill(5)(low).flatten ++ Seq.fill(2)(lower).flatten ++ Seq(0, 0),
      expShard(0L), expPos(0L).toLong)))
    assert(rows(1) == ((1L, 1L, 24, Seq(24), Seq(0),
      Seq.fill(6)(newest).flatten, expShard(1L), expPos(1L).toLong)))
    assert(rows(2) == ((2L, 1L, 12, Seq(12), Seq(0),
      Seq.fill(3)(widest).flatten ++ Seq.fill(8)(0),
      expShard(2L), expPos(2L).toLong)))
  }

  test("crawl-to-training end-to-end: WARC → curateWeb → byte BPE → pack → manifest") {
    // the full front door: a WARC archive in, packed integer training
    // sequences and an audit manifest out — every stage is an operator
    // this library ships, composed the way a real pipeline runs them
    import graft.operators.{Bpe, Curation, Packing}
    import graft.sources.Ingest
    import org.apache.spark.sql.functions._
    def page(body: String) = s"<html><title>t</title><body><p>$body</p></body></html>"
    val docs = Seq(
      (1L, "http://a.com/x", page("the quick brown fox jumps over the lazy dog again and again")),
      (2L, "http://a.com/x?utm_source=f", page("the quick brown fox jumps over the lazy dog again and again")), // same canonical URL → dropped
      (3L, "http://b.com/y", page("a completely different english document about training data pipelines")),
      (4L, "http://c.com/menu", "<html><body><a href='/1'>home</a><a href='/2'>about</a></body></html>"), // link-farm → dropped
      (5L, "http://d.com/z", page("tiny"))) // under minTokens → dropped
      .toDF("doc_id", "url", "html")
    // 1. serialize into one WARC file and parse it back (the archive leg)
    val warcFile = docs
      .withColumn("rec", Ingest.warcRecord(lit("response"), col("url"),
        lit("2026-01-01T00:00:00Z"), col("html")))
      .agg(array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("rec")))),
        x => x.getField("rec")), "").as("content"))
    val crawl = Ingest.warc(warcFile, "content")
      .select((col("rec_index") + 1).cast("long").as("doc_id"),
        col("target_uri").as("url"), col("payload").as("html"))
    assert(crawl.count() == 5)
    // 2. crawl-side curation: extract, link gate, canonical-URL dedup,
    //    lang/quality/token filters, near-dup keep
    val curated = Curation.curateWeb(crawl,
      langs = Seq("en", "und"), minQuality = 0.0, minTokens = 5)
    val keptIds = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 3L), keptIds)
    // 3. tokenizer side: byte-level merges → ids (no <unk> possible) →
    //    packed sequences with boundary metadata → shard manifest
    val merges = Bpe.trainMergesBytes(curated, numMerges = 10, minCount = 1)
    val ids = Bpe.tokenizeIdsBytes(curated, merges, Bpe.byteVocab(merges))
      .select(col("doc_id"), col("token_ids"))
    assert(ids.collect().forall(!_.getSeq[Int](1).contains(0)))
    val packed = Packing.emitPackedIds(ids, budget = 64, buckets = 1)
    val stats = Packing.packStats(packed, budget = 64).head
    // conservation: payload tokens = sum of per-doc ids
    val totalIds = ids.select(sum(size(col("token_ids")))).head.getLong(0)
    assert(stats.getAs[Long]("payload_tokens") == totalIds)
    assert(stats.getAs[Long]("n_docs") == 2L)
    val manifest = Packing.shardManifest(
      packed.withColumn("text", concat_ws(" ", col("token_ids"))),
      shards = 2, idCol = "seq_id")
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == stats.getAs[Long]("n_seqs"))
  }

  test("crawl-discovery end-to-end: robots → sitemap → frontierSchedule → fetch → curateWeb") {
    // the crawl-side front door, the discovery/politeness sibling of the
    // WARC chain above: robots.txt seeds the sitemap fetch, the sitemap
    // (and a sitemapindex hop) seeds the frontier, politeness schedules
    // it, and the fetched pages flow into web curation — every stage an
    // operator this library ships, composed as a crawler runs them
    import graft.operators.{Curation, WebOps}
    import org.apache.spark.sql.functions._
    val ua = "graftbot"
    // 1. per-host robots: a politeness delay, a disallow, and the
    //    sitemap pointer that seeds discovery
    val robots = Seq(
      ("a.com",
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n" +
          "Sitemap: https://a.com/sitemap-index.xml"))
      .toDF("host", "content")
    val rules = WebOps.parseRobots(robots)
    val seeds = rules.filter(col("directive") === "sitemap")
      .select(col("host"), col("value").as("url"))
    assert(seeds.collect().map(_.getString(1)).toSeq ==
      Seq("https://a.com/sitemap-index.xml"), "robots must seed the sitemap")
    // 2. fetch the seed (simulated) → it is a sitemapindex; one hop
    val indexDoc = seeds.withColumn("content", lit(
      "<sitemapindex><sitemap><loc>https://a.com/sitemap-1.xml</loc>" +
        "</sitemap></sitemapindex>"))
    val hop = WebOps.parseSitemap(indexDoc)
    assert(hop.select("kind", "loc").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq ==
      Seq(("sitemap", "https://a.com/sitemap-1.xml")))
    // 3. fetch the child sitemap (simulated) → the page frontier,
    //    including a robots-disallowed URL the scheduler must bench
    val childDoc = hop.select(col("host"), col("loc").as("url"))
      .withColumn("content", lit(
        "<urlset>" +
          "<url><loc>http://a.com/page1</loc><lastmod>2026-01-05</lastmod></url>" +
          "<url><loc>http://a.com/page2</loc></url>" +
          "<url><loc>http://a.com/private/x</loc></url>" +
          "</urlset>"))
    val frontier = WebOps.parseSitemap(childDoc)
      .filter(col("kind") === "url").select(col("loc").as("url"))
    // 4. politeness: allowed pages get per-host fetch slots at the
    //    host's declared 2 s delay; the disallowed URL stays unscheduled
    val sched = WebOps.frontierSchedule(frontier, rules, ua)
    val byUrl = sched.collect().map(r => r.getString(0) ->
      ((r.getBoolean(1), Option(r.get(3)).map(_.toString.toInt),
        Option(r.get(4)).map(_.toString.toDouble)))).toMap
    assert(byUrl("http://a.com/page1") == ((true, Some(1), Some(0.0))), byUrl)
    assert(byUrl("http://a.com/page2") == ((true, Some(2), Some(2.0))), byUrl)
    assert(byUrl("http://a.com/private/x") == ((false, None, None)), byUrl)
    // 5. fetch the scheduled pages (simulated bodies) → web curation
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val fetched = sched.filter(col("allowed") && col("fetch_seq").isNotNull)
      .select(col("url"), monotonically_increasing_id().as("doc_id"))
      .withColumn("html", when(col("url").endsWith("page1"),
          page("a clean english document about crawl scheduling and data"))
        .otherwise(page("tiny")))
    val curated = Curation.curateWeb(fetched,
      langs = Seq("en", "und"), minQuality = 0.0, minTokens = 5)
    val kept = curated.select("url").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("http://a.com/page1"),
      s"curation must keep the real page and drop the stub: $kept")
  }

  test("daily-ingest end-to-end: stored signatures gate a new batch at " +
      "paragraph then span granularity") {
    // the incremental-ingest composition: the corpus materializes its
    // paragraph AND span signature tables once; a new batch dedups
    // coarse-to-fine — whole duplicated paragraphs first (cheap, whole-
    // unit), then word-window spans the paragraph hash can't see
    // (copied sentences inside otherwise-new paragraphs)
    import graft.operators.{Dedup, TextOps}
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (100L, "corpus paragraph with enough characters here"),
      (101L, "s1 s2 s3 s4 tail1 tail2")).toDF("doc_id", "text")
    val paraSigs = Dedup.paragraphSignatures(corpus, minChars = 10)
    val spanSigs = TextOps.spanSignatures(corpus, n = 4)
    val batch = Seq(
      // doc 1 re-posts a corpus paragraph verbatim + a fresh one
      (1L, "corpus paragraph with enough characters here\n\nfresh unique paragraph lives here"),
      // doc 2 embeds a corpus SPAN inside a paragraph the corpus never
      // had — invisible to the paragraph hash, caught by the span table
      (2L, "pre0 s1 s2 s3 s4 post0")).toDF("doc_id", "text")
    val afterParas = Dedup.dropDupParagraphsAgainst(batch, paraSigs, minChars = 10)
    val p = afterParas.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(p(1L) == (("fresh unique paragraph lives here", 1L)), p(1L))
    assert(p(2L) == (("pre0 s1 s2 s3 s4 post0", 0L)), p(2L)) // para hash blind
    val afterSpans = TextOps.removeDupSpansAgainst(
      afterParas.select(col("doc_id"), col("clean_text").as("text")),
      spanSigs, n = 4)
    val s = afterSpans.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(s(1L) == (("fresh unique paragraph lives here", 0L)), s(1L))
    assert(s(2L) == (("pre0 post0", 4L)), s(2L)) // the span stage catches it
  }

  test("image-curation end-to-end: probe gate → pixel decode → perceptual " +
      "near-dup → canonical keep → thumbnails") {
    // the image twin of the text curation chain: header probes reject
    // undecodable/overlarge payloads BEFORE pixel decode, aHash
    // signatures from real decoded pixels feed the SimHash banding
    // machinery, each near-dup cluster keeps one canonical member, and
    // survivors ship as model-input-sized luma thumbnails (never
    // original bytes)
    import graft.operators.{Dedup, Multimodal}
    import org.apache.spark.sql.functions._
    val media = Multimodal.imageNearDupFixture(spark) // 2-bit pair, 0-bit pair, 1 unique
    val feats = Multimodal.imageFeatures(media).where(col("decode_ok")).cache()
    assert(feats.count() == 5)
    val pairs = Dedup.simHashPairsFromSignatures(
      feats.select(col("media_id").as("doc_id"), col("ahash").as("sig")),
      maxDist = 3)
    val kept = Dedup.keepCanonical(
      feats.withColumnRenamed("media_id", "doc_id"), pairs)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L, 12L, 14L), ids) // min-id per cluster + the unique
    val thumbs = Multimodal.imageThumbnail(
      media.join(kept.select(col("doc_id").as("media_id")), "media_id"), 8, 8)
    assert(thumbs.count() == 3 &&
      thumbs.where(size(col("thumb")) === 64).count() == 3)
    feats.unpersist()
  }

  test("mixed-content crawl: WARC → content-type routing → HTML/PDF text " +
      "extraction → one text corpus") {
    // a real crawl archive is not all HTML: route records by declared
    // Content-Type, extract text per format (HtmlOps for pages, PdfOps
    // for documents — binary payloads round-trip the WARC string leg as
    // Latin-1), skip what has no extractor, and land everything in one
    // (doc_id, url, text) corpus the curation chain consumes
    import graft.operators.{HtmlOps, PdfOps}
    import graft.sources.Ingest
    import org.apache.spark.sql.functions._
    val pdfBytes = PdfOps.pdfFixture(spark).collect()
      .find(_.getLong(0) == 70L).get.getAs[Array[Byte]](1)
    val recs = Seq(
      ("http://a.com/page", "text/html",
        "<html><title>t</title><body><p>hello crawl world</p></body></html>"),
      ("http://b.com/doc.pdf", "application/pdf",
        new String(pdfBytes, java.nio.charset.StandardCharsets.ISO_8859_1)),
      ("http://c.com/pic.jpg", "image/jpeg", "ÿØbinary junk"))
      .toDF("url", "ctype", "body")
    val warcFile = recs
      .withColumn("rec", Ingest.warcRecord(lit("response"), col("url"),
        lit("2026-01-01T00:00:00Z"), col("body"), col("ctype")))
      .agg(array_join(array_sort(collect_list(col("rec"))), "").as("content"))
    val crawl = Ingest.warc(warcFile, "content").cache()
    assert(crawl.count() == 3)
    // binary payloads survive the string leg byte-for-byte
    val back = crawl.where(col("content_type") === "application/pdf")
      .select(encode(col("payload"), "ISO-8859-1")).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(back, pdfBytes))
    val routed = crawl.withColumn("text",
      when(col("content_type").startsWith("text/html"),
        HtmlOps.extractText(col("payload")))
        .when(col("content_type") === "application/pdf",
          PdfOps.pdfTextStructCol(encode(col("payload"), "ISO-8859-1"))
            .getField("text")))
      .select(col("rec_index").as("doc_id"), col("target_uri").as("url"),
        col("text"))
    val byUrl = routed.collect().map(r => r.getString(1) -> Option(r.getString(2))).toMap
    assert(byUrl("http://a.com/page").exists(_.contains("hello crawl world")))
    assert(byUrl("http://b.com/doc.pdf")
      .contains("Hello World(!)\nSecond line\nHello2"))
    assert(byUrl("http://c.com/pic.jpg").isEmpty) // no extractor → NULL text
    crawl.unpersist()
  }

  test("video corpus alignment: subtitle cues → nearest-preceding MP4 " +
      "keyframe byte ranges via as-of join") {
    // the multimodal pairing shape: caption text aligns to the keyframe
    // a GPU decoder would actually read (codec-free on both sides —
    // cue times from SubtitleOps, byte ranges from the sample tables)
    import graft.operators.{Joins, Multimodal, SubtitleOps}
    import org.apache.spark.sql.functions._
    val keyframes = Multimodal.mp4KeyframePlan(Multimodal.mp4Fixture(spark))
      .where(col("mp4_ok"))
      .select(col("media_id"), col("time_ms").as("kf_time"),
        col("offset").as("kf_offset"), col("size").as("kf_size"))
    // cues authored against media 40 (keyframes at t=0 and t=400)
    val cues = Seq(
      (40L, 50L, "opening line"), (40L, 380L, "still scene one"),
      (40L, 450L, "scene two starts"))
      .toDF("media_id", "cue_start", "caption")
    val aligned = Joins.asof(
      cues, keyframes.where(col("media_id") === 40L),
      on = Seq("media_id"), leftTs = "cue_start", rightTs = "kf_time",
      valueCols = Seq("kf_offset", "kf_size"))
      .orderBy("cue_start").collect()
    assert(aligned.map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq == Seq(
      ("opening line", 1000L, 10L), // keyframe 1 @ t=0
      ("still scene one", 1000L, 10L),
      ("scene two starts", 2040L, 50L))) // keyframe 5 @ t=400
  }

  test("multi-format corpus curation: raw bytes → sniff/route → text " +
      "curate chain in one call") {
    import graft.operators.{ArchiveOps, Curation, Multimodal, PdfOps}
    import org.apache.spark.sql.functions._
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gos = new java.util.zip.GZIPOutputStream(bos)
      gos.write(data); gos.close()
      bos.toByteArray
    }
    def row(df: org.apache.spark.sql.DataFrame, id: Long): Array[Byte] =
      df.collect().find(_.getLong(0) == id).get.getAs[Array[Byte]](1)
    def page(body: String) = utf8(s"<html><body><p>$body</p></body></html>")
    val mixed = Seq(
      (1L, page("the quick brown fox jumps over the lazy dog")),
      (2L, row(PdfOps.pdfFixture(spark), 70L)),
      (3L, row(ArchiveOps.docxFixture(spark), 94L)),
      (4L, gz(page("a completely different english document about pipelines"))),
      (5L, row(Multimodal.mp4Fixture(spark), 40L)), // textless → dropped
      (6L, utf8("tiny")), // under minTokens → dropped
      (7L, page("the quick brown fox jumps over the lazy hound"))) // near-dup of 1
      .toDF("doc_id", "bytes")
    val kept = Curation.curateBytes(mixed, langs = Seq("en", "und"),
      minQuality = 0.0, minTokens = 3, jaccardThreshold = 0.5)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L), ids) // 7 deduped into 1's cluster
    // the format census column survives curation for the audit
    assert(kept.columns.contains("format"))
    assert(kept.where(col("doc_id") === 2L).select("format")
      .head.getString(0) == "pdf")
  }

  test("archive-to-training: tar.gz corpus → member explosion → routed " +
      "extraction → curate") {
    // books/dumps ship as archives: one tar.gz in, per-member documents
    // out, the same sniff/route/curate chain as loose files
    import graft.operators.{ArchiveOps, Curation, Extract, PdfOps}
    import org.apache.spark.sql.functions._
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def page(body: String) = utf8(s"<html><body><p>$body</p></body></html>")
    // hand-rolled ustar members via the fixture's writer shape
    val members = Seq(
      "site/a.html" -> page("the quick brown fox jumps over the lazy dog"),
      "site/b.html" -> page("an entirely different english page about archives"),
      "docs/c.pdf" -> PdfOps.pdfFixture(spark).collect()
        .find(_.getLong(0) == 70L).get.getAs[Array[Byte]](1),
      "junk/d.bin" -> Array[Byte](0, 1, 2, -1, -2))
    val tarBytes = {
      def header(name: String, size: Long): Array[Byte] = {
        val h = new Array[Byte](512)
        name.getBytes("US-ASCII").copyToArray(h, 0)
        def oct(v: Long, off: Int, len: Int): Unit = {
          val o = java.lang.Long.toOctalString(v)
          ("0" * (len - 1 - o.length) + o).getBytes("US-ASCII")
            .copyToArray(h, off)
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
      members.toArray.flatMap { case (n, d) =>
        header(n, d.length) ++ d ++ new Array[Byte]((512 - d.length % 512) % 512)
      } ++ new Array[Byte](1024)
    }
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val gos = new java.util.zip.GZIPOutputStream(bos)
      gos.write(tarBytes); gos.close(); bos.toByteArray
    }
    val exploded = ArchiveOps.archiveExtractPlan(
      Seq(1L -> gz).toDF("doc_id", "bytes"), ".*\\.(html|pdf)")
      .where(col("entry").isNotNull)
      .select(
        abs(xxhash64(col("doc_id"), col("entry"))).as("doc_id"),
        col("entry"), col("entry_bytes").as("bytes"))
    assert(exploded.count() == 3) // d.bin filtered by the name pattern
    val curated = Curation.curateBytes(exploded, langs = Seq("en", "und"),
      minQuality = 0.0, minTokens = 3)
    assert(curated.count() == 3) // both pages + the pdf text survive
    assert(curated.select("format").collect().map(_.getString(0)).toSet ==
      Set("html", "pdf"))
  }

  test("subtitle QA: cue starts range-join against audio energy spans — " +
      "captions with no sound flag for review") {
    // the a/v-text validation shape: a cue whose start falls inside no
    // energy segment is a timing or transcription defect; both sides
    // are codec-free (SubtitleOps times, wavSegments spans)
    import graft.operators.{Joins, Multimodal}
    import org.apache.spark.sql.functions._
    val spans = Multimodal.wavSegmentPlan(Multimodal.wavSegFixture(spark))
      .where(col("segment").isNotNull)
      .select(col("media_id"), col("start_ms").as("seg_start"),
        col("end_ms").as("seg_end"))
    // media 110's merged span is [100, 550]
    val cues = Seq(
      (110L, 120L, "inside the span"),
      (110L, 560L, "after all sound"),
      (110L, 20L, "before any sound"))
      .toDF("media_id", "cue_start", "caption")
    val voiced = Joins.range(cues, spans, on = Seq("media_id"),
      pointCol = "cue_start", startCol = "seg_start", endCol = "seg_end",
      bucketWidth = 100L)
      .select("caption").collect().map(_.getString(0)).toSet
    assert(voiced == Set("inside the span"))
    val silent = cues.join(
      Joins.range(cues, spans, Seq("media_id"), "cue_start", "seg_start",
        "seg_end", 100L).select("media_id", "cue_start"),
      Seq("media_id", "cue_start"), "left_anti")
      .select("caption").collect().map(_.getString(0)).toSet
    assert(silent == Set("after all sound", "before any sound"))
  }

  test("code-corpus curation: license gate + file gates + router + " +
      "exact dedup in one chain") {
    import graft.operators.{Dedup, TextOps}
    import org.apache.spark.sql.functions._
    val mit = "/* Permission is hereby granted, free of charge */\n"
    val gpl = "/* under the GNU General Public License, version 3 */\n"
    val body = "def f(x):\n    return x + 1\n\nprint(f(2))\n"
    val files = Seq(
      (1L, mit + body), // permissive, clean → kept
      (2L, gpl + body), // copyleft → dropped
      (3L, mit + body), // exact dup of 1 → dropped
      (4L, mit + "x".repeat(3000)), // minified line → dropped
      (5L, mit + "// AUTO-GENERATED do not edit\n" + body), // autogen → dropped
      (6L, "no license header\n" + body)) // unknown license → dropped
      .toDF("doc_id", "text")
    val gated = TextOps.codeFileStats(
      files.withColumn("license", TextOps.licenseId(col("text")))
        .withColumn("permissive", TextOps.licensePermissive(col("text"))))
      .where(col("permissive") && col("flag_code_keep"))
    val kept = Dedup.exactBy(gated, col("text"), "doc_id")
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L), ids)
    assert(kept.head.getAs[String]("license") == "mit")
  }

  test("doc case: filter + unit conversion + CASE grading (EmitSync analog)") {
    // reference doc_cases_test.go:16-52 — same SQL, same expectations;
    // the out-of-range and null readings must be filtered, not errors
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(
      ("dev-01", Some(28.0)), ("dev-02", Some(32.0)), ("dev-03", Some(38.0)),
      ("dev-04", Some(999.0)), ("dev-05", None)
    ).toDF("deviceId", "temperature"))
    val out = ss.execute("""
      SELECT deviceId,
             temperature,
             temperature * 1.8 + 32 AS temp_f,
             CASE WHEN temperature > 35 THEN 'CRITICAL'
                  WHEN temperature > 30 THEN 'WARNING'
                  ELSE 'OK' END AS level
      FROM stream
      WHERE temperature > 0 AND temperature < 100""")
    val got = out.collect().map(r => r.getAs[String]("deviceId") ->
      (r.getAs[Double]("temp_f"), r.getAs[String]("level"))).toMap
    assert(got.keySet == Set("dev-01", "dev-02", "dev-03"))
    assert(math.abs(got("dev-01")._1 - 82.4) < 0.01 && got("dev-01")._2 == "OK")
    assert(math.abs(got("dev-02")._1 - 89.6) < 0.01 && got("dev-02")._2 == "WARNING")
    assert(math.abs(got("dev-03")._1 - 100.4) < 0.01 && got("dev-03")._2 == "CRITICAL")
  }

  test("doc case: stream-table enrichment join drops unmatched devices") {
    // reference doc_cases_test.go:55-82
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(
      ("d1", 31.0), ("d2", 27.5), ("d9", 40.0)).toDF("deviceId", "temperature"))
    ss.registerTable("meta", Seq(
      ("d1", "plantA", "TX-100"), ("d2", "plantB", "TX-200"))
      .toDF("deviceId", "location", "model"))
    val out = ss.execute(
      "SELECT deviceId, m.location, m.model, temperature " +
        "FROM stream JOIN meta m ON deviceId = m.deviceId")
    val got = out.collect().map(r => r.getAs[String]("deviceId") ->
      (r.getAs[String]("location"), r.getAs[String]("model"))).toMap
    assert(got == Map("d1" -> ("plantA", "TX-100"), "d2" -> ("plantB", "TX-200")),
      "d9 has no meta row and must be dropped by the INNER JOIN")
  }

  test("doc case: global lag detects threshold crossings (CDC scenario 1)") {
    // reference doc_cases_test.go:84-110 — no PARTITION BY: one global
    // state, rows in ts order; crossings at ts 2, 5, 7
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(
      (300, 1L), (400, 2L), (200, 3L), (200, 4L),
      (500, 5L), (200, 6L), (400, 7L), (600, 8L)
    ).toDF("current", "ts"))
    val out = ss.execute(
      "SELECT current, ts FROM stream WHERE current > 300 AND lag(current) <= 300 " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    val got = out.collect().map(r => (r.getAs[Int]("current"), r.getAs[Long]("ts")))
      .sortBy(_._2)
    assert(got.toSeq == Seq((400, 2L), (500, 5L), (400, 7L)))
  }

  test("doc case: OVER (WHEN ...) limits lag state to matching rows (CDC scenario 3)") {
    // reference doc_cases_test.go:112-137 — the WHEN gate means device 2's
    // readings never touch the lag state; only ts 5 crosses for device 1
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(
      (300, 1, 1L), (400, 2, 2L), (200, 1, 3L), (200, 2, 4L),
      (500, 1, 5L), (200, 2, 6L), (400, 1, 7L), (600, 2, 8L)
    ).toDF("current", "deviceId", "ts"))
    val out = ss.execute(
      "SELECT current, deviceId, ts FROM stream " +
        "WHERE current > 300 AND deviceId = 1 AND lag(current) OVER (WHEN deviceId = 1) < 300 " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    val got = out.collect().map(r =>
      (r.getAs[Int]("current"), r.getAs[Int]("deviceId"), r.getAs[Long]("ts")))
    assert(got.toSeq == Seq((500, 1, 5L)))
  }

  test("doc case: the four window-SQL shapes execute") {
    // reference doc_cases_test.go:139-156 asserts the doc window SQLs still
    // execute; here each also produces the documented output columns
    val ss = StreamSql(spark)
    ss.registerTable("stream", Seq(
      ("d1", 20.0, 100, 1000L), ("d1", 60.0, 300, 2000L), ("d2", 55.0, 250, 9000L)
    ).toDF("deviceId", "temperature", "concurrency", "ts"))
    val cases = Map(
      "session" -> ("SELECT deviceId, COUNT(*) AS msgs, MAX(ts) AS last_ts FROM stream " +
        "GROUP BY deviceId, SessionWindow('5s') WITH (TIMESTAMP='ts', TIMEUNIT='ms')"),
      "sliding" -> ("SELECT MIN(concurrency) AS mn, COUNT(*) AS c FROM stream " +
        "GROUP BY SlidingWindow('10s','2s') HAVING mn > 200 WITH (TIMESTAMP='ts', TIMEUNIT='ms')"),
      "tumbling" -> ("SELECT deviceId, COUNT(*) AS samples, AVG(temperature) AS a FROM stream " +
        "GROUP BY deviceId, TumblingWindow('1m') WITH (TIMESTAMP='ts', TIMEUNIT='ms')"),
      "global" -> ("SELECT deviceId, MAX(temperature) AS max_t, COUNT(*) AS samples FROM stream " +
        "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN MAX(temperature) > 50 " +
        "WITH (TIMESTAMP='ts', TIMEUNIT='ms')"))
    val expectedCols = Map(
      "session" -> Seq("deviceId", "msgs", "last_ts"),
      "sliding" -> Seq("mn", "c"),
      "tumbling" -> Seq("deviceId", "samples", "a"),
      "global" -> Seq("deviceId", "max_t", "samples"))
    cases.foreach { case (name, sql) =>
      val out = ss.execute(sql)
      assert(out.columns.toSeq == expectedCols(name), s"case $name columns")
      out.collect() // must execute, not just plan
    }
  }
}
