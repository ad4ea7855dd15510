package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the host-level steps of C4/RefinedWeb-style web
  * pipelines (reference scope: per-document curation; URL hygiene is the
  * missing first mile for web corpora): parse URLs at scan speed, filter
  * against domain blocklists, and audit the per-domain mix.
  *
  * All parsing is portable regex/array Column expressions (codegen'd, zero
  * shuffle, replayable in ANSI SQL oracles) — deliberately NOT
  * `parse_url`, whose semantics (exceptions on malformed input, Hive
  * quirks) differ across engines.
  */
object WebOps {

  /** Lowercased host of a URL; NULL when the value does not look like an
    * absolute scheme://host URL. Userinfo and port are stripped. */
  def host(url: Column): Column = {
    val h = regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    when(h === "", lit(null)).otherwise(h)
  }

  /** URL scheme (lowercased), NULL if absent. */
  def scheme(url: Column): Column = {
    val s = regexp_extract(lower(url), "^([a-z][a-z0-9+.-]*)://", 1)
    when(s === "", lit(null)).otherwise(s)
  }

  /** Path component ("" → "/"). */
  def path(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(host(url).isNull, lit(null))
      .otherwise(when(p === "", lit("/")).otherwise(p))
  }

  /** Number of non-empty path segments. */
  def pathDepth(url: Column): Column =
    when(host(url).isNull, lit(null))
      .otherwise(size(filter(split(path(url), "/"), s => s =!= "")))

  // multi-label public suffixes a 2-label cut would get wrong (co.uk,
  // com.au, ...). A full Public Suffix List lookup is a broadcast join
  // against a caller-provided table; this builtin covers the common
  // country-code second-level registrations.
  private val secondLevelSuffixes =
    Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registered (pay-level) domain: the last two host labels, or three when
    * the second-to-last label is a common second-level public suffix
    * (`example.co.uk` → `example.co.uk`, `a.b.example.com` →
    * `example.com`). IPs and single-label hosts pass through unchanged. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val isIp = h.rlike("^[0-9.]+$")
    val sld = element_at(labels, n - 1) // second-to-last label
    val take = when(n >= lit(3) && sld.isin(secondLevelSuffixes: _*), lit(3))
      .otherwise(lit(2))
    when(h.isNull || isIp || n < 2, h)
      .otherwise(concat_ws(".", slice(labels, n - take + 1, take)))
  }

  /** Top-level domain (last host label), NULL for IPs/single labels. */
  def tld(url: Column): Column = {
    val h = host(url)
    when(h.isNull || h.rlike("^[0-9.]+$") || !h.contains("."), lit(null))
      .otherwise(element_at(split(h, "\\."), -1))
  }

  /** Adds `host`, `registered_domain`, `tld`, `path_depth`, `has_query`
    * next to `urlCol` — one scan, zero shuffle. */
  def urlParts(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    df.withColumn("host", host(u))
      .withColumn("registered_domain", registeredDomain(u))
      .withColumn("tld", tld(u))
      .withColumn("path_depth", pathDepth(u))
      .withColumn("has_query", u.contains("?"))
  }

  /** Drop documents whose registered domain appears in `blocked` (one
    * `domain` column) — broadcast anti-join: blocklists are tiny next to
    * the corpus, so no corpus shuffle. Domains compare lowercased. */
  def filterBlockedDomains(
      df: DataFrame,
      blocked: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val b = blocked.select(lower(col("domain")).as("__blocked_domain")).distinct()
    df.join(broadcast(b),
      registeredDomain(col(urlCol)) === col("__blocked_domain"), "left_anti")
  }

  // tracking parameters that vary per click without changing content —
  // the standard strip set for crawl canonicalization
  private val trackingParams =
    Seq("gclid", "fbclid", "msclkid", "ref", "referrer", "source")

  /** Canonical form of a URL — the dedup key for crawls, where the same
    * page is fetched under per-click tracking decorations: scheme and
    * host lowercased, userinfo and default ports (`:80` http / `:443`
    * https) stripped, fragment dropped, `utm_*` and click-id query
    * params removed, surviving params sorted by name, trailing path
    * slash trimmed (root stays `/`). Path case is preserved (paths are
    * case-sensitive; hosts are not). Non-URL input returns NULL so a
    * canonical-key dedup never unifies junk rows. Pure regex/array
    * Column chain — codegen'd, zero shuffle, ANSI-replayable. */
  def canonicalUrl(url: Column): Column = {
    val h = host(url) // lowercased, userinfo/port already stripped
    val sch = scheme(url)
    // host() drops every port; a dedup key must keep NON-default ports
    // (http://x:8080 is a different origin than http://x)
    val port = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)", 1)
    val portSuffix = when(
      port === "" ||
        (sch === "http" && port === "80") ||
        (sch === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val p0 = path(url)
    val p = when(p0 === "/", p0)
      .otherwise(regexp_replace(p0, "/+$", ""))
    // anchor to the PRE-fragment part: a '?' inside the fragment (hash-
    // routing URLs like /p#/route?tab=1) must not leak params into the
    // canonical key — the fragment is dropped wholesale
    val query = regexp_extract(url, "^[^#]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"), kv =>
      kv =!= "" &&
        !kv.rlike("^(?i)utm_[a-z0-9_]*=") &&
        !lower(regexp_extract(kv, "^([^=]*)", 1)).isin(trackingParams: _*))
    val qs = array_join(array_sort(params), "&")
    when(h.isNull, lit(null))
      .otherwise(concat(sch, lit("://"), h, portSuffix, p,
        when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  /** Per-domain corpus audit: document count, token total, and corpus
    * share per registered domain, largest first — the "is one domain
    * dominating the mix" check before training. One partial-agg shuffle
    * on the domain key. */
  def domainStats(
      df: DataFrame,
      urlCol: String = "url",
      textCol: String = "text"): DataFrame = {
    val agg = df
      .groupBy(registeredDomain(col(urlCol)).as("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol))).as("total_tokens"))
    // corpus share via a broadcast 1-row total — an unpartitioned window
    // would coalesce the (web-scale: millions of) domains to one partition
    val total = agg.agg(sum(col("n_docs")).as("__total"))
    agg.crossJoin(broadcast(total))
      .withColumn("doc_share", round(col("n_docs") / col("__total"), 6))
      .drop("__total")
      .orderBy(col("n_docs").desc, col("registered_domain"))
  }

  /** robots.txt parsing (RFC 9309 grouping): one row per (group,
    * directive) — the politeness table a crawl pipeline joins its URL
    * frontier against. Comments strip at `#`, blank lines and malformed
    * lines drop, directive names case-fold; a group is the block of
    * CONSECUTIVE `User-agent:` lines plus the rules that follow it (a
    * later `User-agent:` line starts a NEW group, so its rules never leak
    * backward); rules that precede any group are invalid per the RFC and
    * drop. `Sitemap:` is group-independent — it emits with a NULL
    * user_agent wherever it appears.
    *
    * Output: keyCol + (user_agent, directive, value, line_no). Pure
    * line-algebra in the scan plus one per-file window on (keyCol,
    * line_no) — robots files are KB-sized, so the window partition is a
    * file, never a corpus. */
  def parseRobots(
      df: DataFrame,
      contentCol: String = "content",
      keyCol: String = "host"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df
      .select(col(keyCol),
        posexplode(split(col(contentCol), "\n")).as(Seq("line_no", "__l")))
      .withColumn("__s", trim(regexp_replace(col("__l"), "#.*$", "")))
      .filter(col("__s") =!= "")
      .withColumn("__k", lower(trim(regexp_extract(col("__s"), "^([^:]+):", 1))))
      .withColumn("__v", trim(regexp_extract(col("__s"), "^[^:]+:(.*)$", 1)))
      .filter(col("__k") =!= "")
      .drop("__l", "__s")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("line_no"))
    val isUA = col("__k") === "user-agent"
    val flagged = lines
      .withColumn("__blockStart",
        (isUA && !coalesce(lag(isUA, 1).over(w), lit(false))).cast("int"))
      .withColumn("__block", sum(col("__blockStart")).over(w))
    val uas = flagged.filter(isUA)
      .select(col(keyCol), col("__block"), col("__v").as("user_agent"))
    val rules = flagged.filter(!isUA && col("__k") =!= "sitemap")
      .select(col(keyCol), col("__block"),
        col("__k").as("directive"), col("__v").as("value"), col("line_no"))
    val sitemaps = flagged.filter(col("__k") === "sitemap")
      .select(col(keyCol), lit(null).cast("string").as("user_agent"),
        lit("sitemap").as("directive"), col("__v").as("value"), col("line_no"))
    rules.join(uas, Seq(keyCol, "__block"))
      .select(col(keyCol), col("user_agent"), col("directive"),
        col("value"), col("line_no"))
      .unionByName(sitemaps)
  }

  /** Frontier politeness decision over [[parseRobots]] output: each URL is
    * allowed unless its host's applicable rule group disallows it under
    * RFC 9309 precedence — the group for the crawler's OWN user-agent
    * when the host declares one, else the `*` group; among matching
    * rules the LONGEST literal path prefix wins, ties go to allow; an
    * empty rule value matches nothing; hosts with no applicable rules
    * allow everything. Wildcard rules (`*`/`$` in the path) are outside
    * this literal-prefix subset and are ignored, documented here.
    *
    * Shape at scale: rules tables are KB-per-host — the join broadcasts;
    * the frontier is never shuffled. `urlCol` values must be unique (a
    * frontier). Output: the frontier's columns + `allowed`. */
  def robotsAllowed(
      urls: DataFrame,
      rules: DataFrame,
      userAgent: String,
      urlCol: String = "url",
      keyCol: String = "host"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ua = userAgent.toLowerCase
    val applicable = rules
      .filter(col("directive").isin("allow", "disallow") &&
        (lower(col("user_agent")) === ua || col("user_agent") === "*") &&
        !col("value").contains("*") && !col("value").contains("$"))
      .withColumn("__sp", (lower(col("user_agent")) === ua).cast("int"))
      .withColumn("__best", max(col("__sp")).over(Window.partitionBy(col(keyCol))))
      .filter(col("__sp") === col("__best"))
      .select(col(keyCol).as("__rhost"), col("directive"), col("value"))
    val u = urls.withColumn("__host", host(col(urlCol)))
      .withColumn("__path", path(col(urlCol)))
    val decided = u.join(broadcast(applicable),
        u("__host") === applicable("__rhost"), "left")
      .withColumn("__score", when(col("value").isNotNull &&
        col("value") =!= "" && col("__path").startsWith(col("value")),
        length(col("value"))).otherwise(lit(-1)))
      .withColumn("__rn", row_number().over(Window.partitionBy(col(urlCol))
        .orderBy(col("__score").desc, (col("directive") === "allow").desc)))
      .filter(col("__rn") === 1)
      .withColumn("allowed",
        !(col("__score") >= 0 && col("directive") === "disallow"))
    decided.select(urls.columns.map(col) :+ col("allowed"): _*)
  }
}
