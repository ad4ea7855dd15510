package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** HTML → text extraction semantics on hand-built markup. */
class HtmlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(HtmlOps.extractText(col("html")).as("t"))
      .head().getString(0)

  test("script, style and comments are dropped; block tags become lines") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style></head>
        |<body><!-- nav --><script>var x = "<p>hidden</p>";</script>
        |<h1>Head</h1><p>First para.</p><p>Second  para.</p>
        |<ul><li>one</li><li>two</li></ul></body></html>""".stripMargin
    val t = extract(html)
    assert(!t.contains("hidden") && !t.contains("color") && !t.contains("nav"))
    assert(t.split("\n").toSeq == Seq("T", "Head", "First para.", "Second para.", "one", "two"))
  }

  test("inline tags are removed without splitting words; entities decode once") {
    val t = extract("<p>don'<i>t</i> &amp;amp; <b>bold</b> &lt;tag&gt; &nbsp;x</p>")
    assert(t == "don't &amp; bold <tag> x")
  }

  test("br breaks lines; plain text passes through with ws normalization") {
    assert(extract("a<br>b<br/>c") == "a\nb\nc")
    assert(extract("  plain\t\ttext \n\n here ") == "plain text\nhere")
  }

  test("htmlStats computes title, counts, and link density") {
    val html = "<html><head><title> My  Page </title></head><body>" +
      "<p>Some visible text here</p>" +
      "<p><a href=\"/a\">click</a> and <a href=\"/b\"><b>more</b></a></p></body></html>"
    val r = HtmlOps.htmlStats(Seq(html).toDF("html"))
      .select("text_extracted", "title", "n_tags", "n_anchors", "link_density")
      .head()
    assert(r.getString(1) == "My Page")
    assert(r.getInt(3) == 2)
    val text = r.getString(0)
    // anchor text "click" (5) + "more" (4) over the extracted length
    assert(math.abs(r.getDouble(4) - 9.0 / text.length) < 1e-6)
    assert(r.getInt(2) > 8)
  }

  test("empty extraction yields null link density, not a divide error") {
    val r = HtmlOps.htmlStats(Seq("<style>a{}</style>").toDF("html"))
      .select("text_extracted", "link_density").head()
    assert(r.getString(0) == "")
    assert(r.isNullAt(1))
  }

  test("unclosed script swallows the tail (documented contract)") {
    assert(extract("<p>ok</p><script>var x;") == "ok")
  }

  test("extractLinks aligns href/text, resolves roots, cleans anchors") {
    val html = "<a href=\"https://ext.com/p\">Ext &amp; co</a>" +
      "<a class=\"x\" href=\"/local/1\"><b>go</b>  now</a>" +
      "<a href=\"#top\">top</a><a href=\"//proto.rel/x\">pr</a>"
    val r = HtmlOps.extractLinks(
        Seq(("https://base.org/page", html)).toDF("url", "html"))
      .select("link_pos", "href", "abs_url", "anchor_text")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (0, "https://ext.com/p", "https://ext.com/p", "Ext & co"),
      (1, "/local/1", "https://base.org/local/1", "go now"),
      (2, "#top", null, "top"),
      (3, "//proto.rel/x", null, "pr")))
  }

  test("fuzz: escape -> extract round-trips to whitespace-normalized text") {
    // html-escaping arbitrary text and extracting must give back the
    // original up to the documented whitespace normalization — one Spark
    // job over 400 seeded-random samples (batched table-driven property)
    val rnd = new scala.util.Random(42)
    val alphabet = "ab z.!?-&<>\"'\n\t&lt;&amp;"
    def sample(): String =
      (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def escape(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def normRef(s: String): String = {
      val a = s.replaceAll("[ \t\r\f]+", " ")
        .replaceAll(" ?\n ?", "\n").replaceAll("\n+", "\n")
        .replaceAll("^\n+|\n+$", "")
      // spark trim() strips spaces only — strip manually, not String.trim
      a.replaceAll("^ +| +$", "")
    }
    val texts = Seq.fill(400)(sample())
    val got = texts.map(escape).toDF("html")
      .select(HtmlOps.extractText(col("html")).as("t"))
      .collect().map(_.getString(0))
    texts.zip(got).foreach { case (orig, g) =>
      assert(g == normRef(orig), s"original: ${orig.replace("\n", "\\n")}")
    }
  }

  test("extractLinks yields no rows for anchor-free pages") {
    assert(HtmlOps.extractLinks(
      Seq(("https://b.org", "<p>plain</p>")).toDF("url", "html")).count() == 0)
  }

  test("metaRobots: attribute orders, token boundaries, documented quote contract") {
    def one(html: String) = HtmlOps.metaRobots(Seq(html).toDF("html"))
      .select("robots_noindex", "robots_nofollow", "canonical_url",
        "n_nofollow_links").head()
    // token boundary: 'follow' is not 'nofollow', 'noindexing' not 'noindex'
    val r1 = one("<meta name=\"robots\" content=\"noindexing, follow\">")
    assert(!r1.getBoolean(0) && !r1.getBoolean(1))
    // whitespace around tokens
    val r2 = one("<meta name=\"robots\" content=\" noindex , nofollow \">")
    assert(r2.getBoolean(0) && r2.getBoolean(1))
    // reversed canonical attribute order
    val r3 = one("<link href=\"https://x.y/p\" rel=\"canonical\">")
    assert(r3.getString(2) == "https://x.y/p")
    // single-quoted attributes are outside the documented contract
    val r4 = one("<meta name='robots' content='noindex'>")
    assert(!r4.getBoolean(0) && r4.isNullAt(2))
    // extra attributes between the interesting ones
    val r5 = one("<meta id=\"m\" name=\"robots\" data-x=\"1\" content=\"none\">" +
      "<a class=\"c\" rel=\"me nofollow ugc\" href=\"/q\">q</a>")
    assert(r5.getBoolean(0) && r5.getBoolean(1) && r5.getInt(3) == 1)
    // MULTIPLE robots metas all count (directives union)
    val r6 = one("<meta name=\"robots\" content=\"nofollow\">" +
      "<meta name=\"robots\" content=\"noindex\">")
    assert(r6.getBoolean(0) && r6.getBoolean(1))
    // first canonical in DOCUMENT order wins regardless of attribute order
    val r7 = one("<link href=\"https://first.com/a\" rel=\"canonical\">" +
      "<link rel=\"canonical\" href=\"https://second.com/b\">")
    assert(r7.getString(2) == "https://first.com/a")
    // whitespace-separated directive tokens (newline/tab) still match
    val r8 = one("<meta name=\"robots\" content=\"noindex,\n\tnofollow\">")
    assert(r8.getBoolean(0) && r8.getBoolean(1))
    // NULL html reads directive-free (false flags), never NULL booleans
    val r9 = HtmlOps.metaRobots(
      Seq((1, null: String)).toDF("id", "html"))
      .select("robots_noindex", "robots_nofollow", "canonical_url").head()
    assert(!r9.getBoolean(0) && !r9.getBoolean(1) && r9.isNullAt(2))
    // an href-less canonical tag never shadows a later complete one
    val r10 = one("<link rel=\"canonical\">" +
      "<link rel=\"canonical\" href=\"https://real.example/x\">")
    assert(r10.getString(2) == "https://real.example/x")
    // tag-name boundary: <area>/<abbr>/<article> carrying a nofollow rel
    // are NOT anchor links; a real <a> beside them still counts
    val r11 = one("<area href=\"/m\" rel=\"nofollow\">" +
      "<abbr rel=\"nofollow\">t</abbr><article rel=\"nofollow\"></article>" +
      "<a href=\"/ok\" rel=\"nofollow\">ok</a>")
    assert(r11.getInt(3) == 1, s"expected 1 nofollow link, got ${r11.getInt(3)}")
  }

  test("meanPool matches the per-dimension explode formulation and skips ragged vectors") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001")("embeddings")
      .withColumn("grp", pmod(col("vec_id"), lit(7)))
    val pooled = Similarity.meanPool(emb, Seq("grp"))
      .select(col("grp"), posexplode(col("mean_vec")).as(Seq("i", "v")))
      .select(col("grp"), col("i").cast("int").as("i"), round(col("v"), 9).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val ref = emb
      .select(col("grp"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("grp", "i").agg(round(avg(col("x").cast("double")), 9).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(pooled.size == 7 * 64)
    assert(pooled.keySet == ref.keySet)
    pooled.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-8, s"$k: $v vs ${ref(k)}")
    }
    // ragged vector skipped; all-ragged group pools to empty
    val mixed = Seq(
      (0L, Seq(2.0f, 4.0f)), (0L, Seq(4.0f, 8.0f)), (0L, Seq(1.0f)),
      (1L, Seq(9.9f, 9.9f, 9.9f))).toDF("grp", "embedding")
    val got = Similarity.meanPool(mixed, Seq("grp"), dims = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(0L) == Seq(3.0, 6.0))
    assert(got(1L).isEmpty)
  }
}
