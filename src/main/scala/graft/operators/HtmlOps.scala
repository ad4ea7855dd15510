package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform of every web-corpus
  * pipeline (C4, RefinedWeb, Gopher all start from crawled markup;
  * reference scope is per-document curation of already-extracted text, so
  * this is the missing step upstream of [[TextOps]]).
  *
  * Everything is a chain of portable regex/array Column expressions:
  * codegen'd, one scan, zero shuffle, and replayable verbatim in an ANSI
  * SQL oracle (RE2-compatible patterns only — no backreferences or
  * lookaround, inline `(?is)` flags, lazy quantifiers). This is
  * deliberately a fast scan-speed extractor, not a DOM parser: malformed
  * markup degrades to extra whitespace, never to an error.
  *
  * Known simplifications (documented contract, shared by the oracle):
  *   - numeric character references (`&#8217;`) are not decoded (a
  *     per-match computed replacement is not expressible as a static
  *     expression); the six common named entities are;
  *   - CDATA sections are treated as text;
  *   - `<script`/`<style` match by prefix, so an unclosed block swallows
  *     the rest of the document — same failure mode as the streaming
  *     extractors used in production pipelines.
  */
object HtmlOps {

  /** Decode the six named entities that dominate real markup; `&amp;`
    * last so double-encoded text decodes exactly one level. */
  def decodeEntities(c: Column): Column = {
    val named = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
    val d = named.foldLeft(c) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }
    replace(d, lit("&amp;"), lit("&"))
  }

  // tags whose open/close is a paragraph-ish boundary → newline, so block
  // structure survives as line structure for TextOps line-based metrics
  private val blockTags =
    "p|div|h[1-6]|li|ul|ol|tr|table|blockquote|pre|section|article|" +
      "header|footer|title|head|body|html"

  /** Collapse whitespace: runs of spaces/tabs/CR → one space, spaces
    * hugging a newline dropped, newline runs → one newline, outer
    * whitespace trimmed. Line structure (one line per block element) is
    * preserved. */
  def normalizeWs(c: Column): Column = {
    val sp = regexp_replace(c, "[ \\t\\r\\f]+", " ")
    val hug = regexp_replace(sp, " ?\\n ?", "\n")
    val nl = regexp_replace(hug, "\\n+", "\n")
    trim(regexp_replace(nl, "^\\n+|\\n+$", ""))
  }

  /** Visible text of an HTML document: comments, script and style blocks
    * dropped; block-tag boundaries become newlines; inline tags are
    * removed; entities decoded; whitespace normalized. Plain text (no
    * tags) passes through with only whitespace normalization. */
  def extractText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style.*?</style>", " ")
    // the lazy pair-patterns above skip an UNCLOSED block entirely; a
    // second open-to-end sweep drops it (the documented swallow-the-tail
    // contract — leaking raw JS/CSS into text would be worse)
    val noOpen = regexp_replace(noStyle, "(?is)<(?:script|style).*", " ")
    val blocks = regexp_replace(noOpen, s"(?i)</?(?:$blockTags)[^>]*>", "\n")
    val br = regexp_replace(blocks, "(?i)<br[^>]*>", "\n")
    val noTags = regexp_replace(br, "(?s)<[^>]*>", "")
    normalizeWs(decodeEntities(noTags))
  }

  /** `<title>` text (entity-decoded, whitespace-collapsed); "" when the
    * document has none — callers can `nullif` if they prefer NULL. */
  def title(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)),
      // explicit class, not \s: Java \s includes \x0B, RE2's does not —
      // the oracle must see the identical character set
      "[ \\t\\n\\r\\f]+", " "))

  /** Visible character count inside `<a>` elements (inner tags stripped,
    * entities decoded, whitespace collapsed) — the numerator of
    * link-density boilerplate scoring. */
  def anchorTextLen(html: Column): Column = {
    val anchors = regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val lens = transform(anchors, a =>
      length(trim(regexp_replace(
        decodeEntities(regexp_replace(a, "(?s)<[^>]*>", "")),
        "[ \\t\\n\\r\\f]+", " "))))
    coalesce(aggregate(lens, lit(0), (acc, x) => acc + x), lit(0))
  }

  // one regex, two capture groups; extracting each group with the SAME
  // pattern yields index-aligned arrays, so zip is exact — no per-match
  // struct support needed
  private val hrefPat = "(?is)<a[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** One row per `<a href="...">` link: `href` as written, `abs_url`
    * resolved against `baseUrlCol` (absolute hrefs pass through,
    * root-relative `/p` joins scheme://host, anything else — protocol-
    * relative, path-relative, `javascript:` — is NULL rather than
    * guessed), and the cleaned visible `anchor_text`. The link graph +
    * anchor-text corpus extractor: posexplode of two aligned
    * regexp_extract_all arrays, zero shuffle, link order preserved via
    * `link_pos`. */
  def extractLinks(
      df: DataFrame,
      htmlCol: String = "html",
      baseUrlCol: String = "url"): DataFrame = {
    val h = col(htmlCol)
    val hrefs = regexp_extract_all(h, lit(hrefPat), lit(1))
    val texts = regexp_extract_all(h, lit(hrefPat), lit(2))
    val zipped = df.withColumn("__lnk", arrays_zip(hrefs.as("href"), texts.as("txt")))
      .select(col("*"), posexplode(col("__lnk")).as(Seq("link_pos", "__l")))
      .drop("__lnk")
    val href = col("__l.href")
    val base = col(baseUrlCol)
    val origin = concat(WebOps.scheme(base), lit("://"), WebOps.host(base))
    zipped
      .withColumn("href", href)
      .withColumn("abs_url",
        when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
          .when(href.startsWith("//") || WebOps.host(base).isNull, lit(null))
          .when(href.startsWith("/"), concat(origin, href))
          .otherwise(lit(null)))
      .withColumn("anchor_text",
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("__l.txt"), "(?s)<[^>]*>", "")),
          "[ \\t\\n\\r\\f]+", " ")))
      .drop("__l")
  }

  /** Page-level crawl directives — the per-PAGE gate between the
    * host-level robots.txt decision ([[WebOps.robotsAllowed]]) and text
    * extraction: a corpus build must drop `noindex` pages and prefer the
    * canonical URL for dedup keys. Adds
    *   - `robots_noindex` / `robots_nofollow`: from any
    *     `<meta name="robots" content="...">` (either attribute order,
    *     case-insensitive; the `none` token means both),
    *   - `canonical_url`: the first `<link rel="canonical" href="...">`
    *     (either attribute order; NULL when absent),
    *   - `n_nofollow_links`: count of `<a>` whose `rel` contains
    *     `nofollow`.
    * Double-quoted attributes only (same documented contract as the link
    * extractor); pure RE2-portable regex chain, one scan, zero shuffle.
    */
  def metaRobots(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    df.withColumn("robots_noindex", robotsDirective(h, "noindex"))
      .withColumn("robots_nofollow", robotsDirective(h, "nofollow"))
      .withColumn("canonical_url", canonicalLink(h))
      .withColumn("n_nofollow_links", nofollowLinkCount(h))
  }

  /** Whether any `<meta name="robots">` content carries `token` (or the
    * `none` umbrella) — Column form of the [[metaRobots]] flags, also on
    * the dialect surface as `robots_noindex`/`robots_nofollow`.
    * ALL tags of the kind are collected in document order, then
    * filtered/extracted per tag — attribute order stops mattering and
    * multiple robots metas all count (the two-pattern regexp_extract
    * draft read one tag per PATTERN, dropping a second meta's
    * directives). NULL html reads directive-free (false), never a NULL
    * boolean a downstream !filter would silently drop. */
  def robotsDirective(html: Column, token: String): Column = {
    val robotsTags = filter(
      regexp_extract_all(html, lit("(?is)<meta[^>]*>"), lit(0)),
      t => t.rlike("(?is)name=\"robots\""))
    val content = coalesce(lower(array_join(
      transform(robotsTags,
        t => regexp_extract(t, "(?is)content=\"([^\"]*)\"", 1)), ",")),
      lit(""))
    content.rlike(s"(^|[\\s,])[\\s]*($token|none)[\\s]*($$|[\\s,])")
  }

  /** First `<link rel="canonical">` WITH an href, in genuine document
    * order (an href-less rel=canonical must not shadow a later complete
    * one); NULL when absent. Dialect scalar `html_canonical`. */
  def canonicalLink(html: Column): Column = {
    val canonTags = filter(
      regexp_extract_all(html, lit("(?is)<link[^>]*>"), lit(0)),
      t => t.rlike("(?is)rel=\"canonical\"") && t.rlike("(?is)href=\""))
    val canon = regexp_extract(
      get(canonTags, lit(0)), "(?is)href=\"([^\"]*)\"", 1)
    when(size(canonTags) > 0 && canon =!= "", canon)
  }

  /** Count of `<a>` anchors whose `rel` contains `nofollow` — the tag
    * name is boundary-anchored (`<a` + whitespace or /): `<a[^>]*` would
    * also match <area>/<abbr>/<article> tags carrying a nofollow rel.
    * Dialect scalar `nofollow_links`. */
  def nofollowLinkCount(html: Column): Column =
    size(regexp_extract_all(html,
      lit("(?is)<a[\\s/][^>]*rel=\"[^\"]*nofollow[^\"]*\"[^>]*>"), lit(0)))

  /** Adds `text_extracted`, `title`, `n_tags`, `n_anchors`,
    * `link_density` next to `htmlCol` — one scan, zero shuffle.
    * `link_density` = anchor text chars / extracted text chars (NULL when
    * nothing was extracted); pages above ~0.5 are navigation/boilerplate
    * in C4-style filtering. */
  def htmlStats(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    val text = extractText(h)
    df.withColumn("text_extracted", text)
      .withColumn("title", title(h))
      .withColumn("n_tags",
        size(regexp_extract_all(h, lit("(?s)</?[a-zA-Z][^>]*>"), lit(0))))
      .withColumn("n_anchors",
        size(regexp_extract_all(h, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))))
      .withColumn("link_density",
        round(anchorTextLen(h) / nullif(length(col("text_extracted")), lit(0)), 6))
  }
}
