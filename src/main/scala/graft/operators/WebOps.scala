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

  /** Path plus query (`/a/b?x=1`), "" → "/" — the robots.txt match
    * target: RFC 9309 rules match against everything after the
    * authority, so a wildcard rule disallowing `?sessionid=` URLs must
    * see the query. The fragment is excluded (never sent to servers). */
  private[graft] def pathQuery(url: Column): Column = {
    val pq = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(host(url).isNull, lit(null))
      .otherwise(when(pq === "", lit("/")).otherwise(pq))
  }

  /** Number of non-empty path segments. */
  def pathDepth(url: Column): Column =
    when(host(url).isNull, lit(null))
      .otherwise(size(filter(split(path(url), "/"), s => s =!= "")))

  /** Per-URL lexical features — the frontier-prioritization / spam-gate
    * signals URL-level quality filters read before fetching anything
    * (deep paths, parameter farms, digit-heavy session ids and tracking
    * decoration all predict low-value pages). Adds `url_len`,
    * `url_depth` (non-empty path segments), `n_params` (query
    * parameters, pre-fragment), `n_host_labels` (dot-separated host
    * labels), `digit_ratio` (digits / url chars) and `has_tracking`
    * (`utm_*` present). Pure Column arithmetic, one scan, zero shuffle;
    * host-dependent features are NULL for unparseable URLs. */
  def urlFeatures(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val q = regexp_extract(u, "^[^#]*\\?([^#]*)", 1)
    val h = host(u)
    df.withColumn("url_len", length(u))
      .withColumn("url_depth", pathDepth(u))
      .withColumn("n_params",
        size(filter(split(q, "&"), s => s =!= "")))
      .withColumn("n_host_labels",
        when(h.isNull, lit(null)).otherwise(size(split(h, "\\."))))
      .withColumn("digit_ratio",
        (length(u) - length(regexp_replace(u, "[0-9]", "")))
          .cast("double") / length(u))
      .withColumn("has_tracking", q.rlike("(?i)(^|&)utm_"))
  }

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

  /** Registered (pay-level) domain under a caller-provided Public Suffix
    * List — the exact lookup [[registeredDomain]]'s builtin ccSLD
    * heuristic approximates (which mis-cuts `*.github.io`-style private
    * suffixes: crawl dedup and domain stats then conflate every user
    * site on the host). `psl` carries one rule per row in `suffixCol`,
    * publicsuffix.org syntax: plain suffixes (`com`, `co.uk`,
    * `github.io`), one-label wildcards (`*.ck`), exceptions (`!www.ck`);
    * comment (`//...`) and blank lines are tolerated and dropped.
    * Prevailing-rule semantics per the PSL algorithm: an exception rule
    * beats everything (its public suffix is the rule minus its leading
    * label), else the matching rule with the most labels; a host whose
    * TLD is in the list but matches no longer rule gets the implicit
    * 1-label public suffix. The registered domain is the public suffix
    * plus one label; a host that IS a public suffix yields NULL. Hosts
    * whose TLD is absent from the list (and IPs) fall back to
    * [[registeredDomain]]'s builtin behavior.
    *
    * Shape at scale: the PSL (~10k rows) groups into one rule array per
    * TLD and BROADCASTS; the corpus side is one scan + broadcast hash
    * join + a per-row `aggregate` fold over its TLD's rule group
    * (typically < 50 entries) — the corpus is never shuffled. */
  def registeredDomainPsl(
      df: DataFrame,
      psl: DataFrame,
      urlCol: String = "url",
      suffixCol: String = "suffix",
      outCol: String = "registered_domain"): DataFrame = {
    val rules = psl
      .select(lower(trim(col(suffixCol))).as("__r"))
      .filter(col("__r") =!= "" && !col("__r").startsWith("//"))
      .withColumn("__exc", col("__r").startsWith("!"))
      .withColumn("__pat", regexp_replace(col("__r"), "^!", ""))
      .select(col("__exc"), col("__pat"),
        split(col("__pat"), "\\.").as("__labs"),
        element_at(split(col("__pat"), "\\."), -1).as("__ptld"))
      .groupBy(col("__ptld"))
      .agg(collect_list(struct(col("__labs").as("labs"),
        size(split(col("__pat"), "\\.")).cast("int").as("nl"),
        col("__exc").as("exc"))).as("__rules"))
    val withHost = df
      .withColumn("__h", host(col(urlCol)))
      .withColumn("__hlabs", split(col("__h"), "\\."))
    val n = size(col("__hlabs"))
    // prevailing rule: exceptions dominate, else most labels; a rule
    // matches when its labels align with the host's trailing labels
    // ('*' matches exactly one label at its position)
    val matched = aggregate(col("__rules"),
      struct(lit(false).as("exc"), lit(0).as("nl")),
      (acc, r) => when(
        n >= r("nl") &&
          forall(zip_with(slice(col("__hlabs"), n - r("nl") + 1, r("nl")),
            r("labs"), (a, b) => b === "*" || a === b), x => x) &&
          ((r("exc") && !acc("exc")) ||
            (r("exc") === acc("exc") && r("nl") > acc("nl"))),
        struct(r("exc").as("exc"), r("nl").as("nl"))).otherwise(acc))
    val psNl = when(matched("exc"), matched("nl") - 1)
      .otherwise(when(matched("nl") > 0, matched("nl")).otherwise(lit(1)))
    val viaPsl = when(n <= psNl, lit(null).cast("string"))
      .otherwise(concat_ws(".", slice(col("__hlabs"), n - psNl, psNl + 1)))
    withHost
      .join(broadcast(rules),
        element_at(col("__hlabs"), -1) === col("__ptld"), "left")
      .withColumn(outCol,
        when(col("__rules").isNull || col("__h").rlike("^[0-9.]+$"),
          registeredDomain(col(urlCol)))
          .otherwise(viaPsl))
      .drop("__h", "__hlabs", "__ptld", "__rules")
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

  /** Effective per-host crawl delay for a user agent over [[parseRobots]]
    * output — the politeness-rate half of the frontier decision
    * ([[robotsAllowed]] is the permission half, sharing the same group
    * election: longest own-UA product-token prefix beats shorter beats
    * `*`, elected over ALL directives).
    * Among the elected groups' `crawl-delay` rows, the MAXIMUM numeric
    * value wins (when a host declares several, the most conservative
    * delay is the polite read); non-numeric values are ignored. Output:
    * one row per host that HAS an elected group — (keyCol, crawl_delay),
    * `crawl_delay` null when the elected group declares none (allow-all
    * pace; hosts absent from the output have no applicable group at
    * all). One KB-per-host aggregation, broadcastable downstream. */
  def crawlDelay(
      rules: DataFrame,
      userAgent: String,
      keyCol: String = "host"): DataFrame = {
    val ua = userAgent.toLowerCase
    // same RFC 9309 prefix election as [[robotsAllowed]]: longest
    // applicable own product-token prefix beats shorter beats '*'
    rules.filter(lit(ua).startsWith(lower(col("user_agent"))) ||
        col("user_agent") === "*")
      .withColumn("__sp", when(col("user_agent") === "*", lit(0))
        .otherwise(length(col("user_agent"))).cast("int"))
      .groupBy(col(keyCol))
      .agg(max(col("__sp")).as("__best"),
        collect_list(struct(col("__sp").as("sp"),
          col("directive").as("dir"), col("value").as("v"))).as("__all"))
      .select(col(keyCol),
        array_max(transform(
          filter(col("__all"), r => r("sp") === col("__best") &&
            r("dir") === "crawl-delay" &&
            r("v").rlike("^[0-9]+(\\.[0-9]+)?$")),
          r => r("v").cast("double"))).as("crawl_delay"))
  }

  /** Politeness-scheduled frontier — [[robotsAllowed]] and [[crawlDelay]]
    * composed into per-host fetch slots: every allowed URL gets a
    * deterministic 1-based `fetch_seq` within its host (URL-string
    * order) and `fetch_offset_sec = (fetch_seq - 1) × delay`, where the
    * delay is the host's elected crawl-delay or `defaultDelay` when the
    * host declares none. Disallowed and host-less (malformed) URLs keep
    * null seq/offset. A fetcher that dispatches URL u no earlier than
    * `t0 + fetch_offset_sec` never exceeds any host's requested rate.
    *
    * Shape at scale: the allow decision and the delay both come from
    * broadcast KB-sized rule tables (no frontier shuffle); the slot
    * assignment is the ONE inherent shuffle of politeness scheduling —
    * per-host ordering — keyed on the host, slim frontier rows only. */
  def frontierSchedule(
      urls: DataFrame,
      rules: DataFrame,
      userAgent: String,
      urlCol: String = "url",
      keyCol: String = "host",
      defaultDelay: Double = 1.0): DataFrame = {
    require(defaultDelay >= 0, "defaultDelay must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val delays = crawlDelay(rules, userAgent, keyCol)
      .withColumnRenamed(keyCol, "__dhost")
    val w = Window.partitionBy(col("__shost"), col("allowed"))
      .orderBy(col(urlCol))
    robotsAllowed(urls, rules, userAgent, urlCol, keyCol)
      .withColumn("__shost", host(col(urlCol)))
      .join(broadcast(delays), col("__shost") === col("__dhost"), "left")
      .withColumn("crawl_delay",
        coalesce(col("crawl_delay"), lit(defaultDelay)))
      .withColumn("fetch_seq",
        when(col("allowed") && col("__shost").isNotNull,
          row_number().over(w)))
      .withColumn("fetch_offset_sec",
        (col("fetch_seq") - 1) * col("crawl_delay"))
      .drop("__shost", "__dhost")
  }

  /** RFC 9309 rule path → portable regex: literal chars escaped, `*`
    * expands to `.*`, a TRAILING `$` anchors the end of the path (a
    * mid-pattern `$` is literal). The result is `^`-anchored, unanchored
    * at the end (prefix semantics), and stays inside the Java/RE2 shared
    * regex subset so oracle engines replay the same matches. */
  private[graft] def robotsPattern(v: Column): Column = {
    val anchored = v.endsWith("$")
    val core = when(anchored, substring(v, lit(1), length(v) - 1)).otherwise(v)
    val esc = regexp_replace(core,
      "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\|\\$])", "\\\\$1")
    val wild = regexp_replace(esc, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** XML sitemap / sitemap-index parsing (sitemaps.org protocol) — the
    * crawl-DISCOVERY complement of [[parseRobots]]' politeness table: a
    * frontier seeds from the robots `sitemap` rows, fetches those
    * documents, and this turns them into per-URL rows. Handles both
    * document kinds in one pass — `<urlset>` entries emit
    * `kind = 'url'`, `<sitemapindex>` entries emit `kind = 'sitemap'`
    * (feed those locs back into the fetch loop). Per entry: `loc`
    * (CDATA unwrapped, the five XML entities sitemap URLs escape
    * decoded), `lastmod` (null unless W3C datetime, the format the
    * protocol pins — a malformed value must not poison downstream
    * recrawl-scheduling casts), `changefreq`, `priority` (null unless
    * numeric — the protocol default 0.5 is the CALLER's choice to
    * apply). Entries without a `<loc>` are invalid per the protocol and
    * drop. Case-insensitive tags, whitespace/attribute tolerant, pure
    * RE2-portable regex chain — one scan, zero shuffle, the per-file
    * explode stays inside the scan stage.
    *
    * Output: the input's other columns + (kind, loc, lastmod,
    * changefreq, priority, entry_no) — `entry_no` is the 0-based
    * position within the file (urls first, then index entries). */
  def parseSitemap(
      df: DataFrame,
      contentCol: String = "content"): DataFrame = {
    def blocks(tag: String): Column =
      regexp_extract_all(col(contentCol),
        lit(s"(?is)<$tag(?:\\s[^>]*)?>(.*?)</$tag\\s*>"), lit(1))
    def field(b: Column, tag: String): Column =
      trim(regexp_extract(b, s"(?is)<$tag(?:\\s[^>]*)?>(.*?)</$tag\\s*>", 1))
    def xmlText(v: Column): Column = {
      val cdata = regexp_replace(v, "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$", "$1")
      // amp decodes LAST so '&amp;lt;' yields the literal '&lt;'
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(trim(cdata)) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    }
    def optional(v: Column): Column = when(v =!= "", v)
    val entries = concat(
      transform(blocks("url"), b => struct(lit("url").as("kind"), b.as("b"))),
      transform(blocks("sitemap"), b => struct(lit("sitemap").as("kind"), b.as("b"))))
    df.select(col("*"), posexplode(entries).as(Seq("entry_no", "__e")))
      .drop(contentCol)
      .withColumn("kind", col("__e")("kind"))
      .withColumn("loc", xmlText(field(col("__e")("b"), "loc")))
      // protocol pins lastmod to W3C datetime (YYYY[-MM[-DD[Thh:mm[:ss
      // [.s]](Z|±hh:mm)]]]); anything else nulls so downstream recrawl
      // scheduling can cast/compare without ANSI throw — same guard
      // discipline as priority
      .withColumn("lastmod",
        when(field(col("__e")("b"), "lastmod").rlike(
            "^[0-9]{4}(-[0-9]{2}(-[0-9]{2}(T[0-9]{2}:[0-9]{2}(:[0-9]{2}" +
              "(\\.[0-9]+)?)?(Z|[+-][0-9]{2}:[0-9]{2}))?)?)?$"),
          field(col("__e")("b"), "lastmod")))
      .withColumn("changefreq",
        optional(lower(field(col("__e")("b"), "changefreq"))))
      .withColumn("priority", // null unless numeric: ANSI cast must not throw
        when(field(col("__e")("b"), "priority")
            .rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$"),
          field(col("__e")("b"), "priority")).cast("double"))
      .filter(col("loc") =!= "")
      .drop("__e")
  }

  /** Frontier politeness decision over [[parseRobots]] output: each URL is
    * allowed unless its host's applicable rule group disallows it under
    * RFC 9309 precedence. Group election first, over ALL of the host's
    * directives: the groups for the crawler's OWN user-agent when the
    * host declares any (even if those groups carry only `crawl-delay` —
    * per the RFC an own group with no path rules means allow-all, NOT
    * fall-through to `*`), else the `*` groups. Then, among the elected
    * groups' allow/disallow rules that match the URL's path+query
    * ([[pathQuery]] — RFC rules see everything after the authority), the
    * LONGEST rule value wins and ties go to allow. `*` matches any
    * character run and a trailing `$` anchors the target end
    * ([[robotsPattern]]);
    * an empty rule value matches nothing; hosts with no applicable
    * group allow everything. User-agent comparison is case-insensitive
    * product-token PREFIX matching — the behavior of Google's
    * open-sourced robots.txt parser, NOT the RFC 9309 letter (§2.2.1
    * specifies case-insensitive EXACT token match; the widely-deployed
    * parser accepts a group whose token is a prefix of the crawler's,
    * so "googlebot-news" obeys a "googlebot" group, and crawler
    * operators name their bots accordingly). The prefix has no
    * token-boundary check, matching that parser: a group named "my"
    * governs a crawler named "mybot" (pinned by the q_robots_allowed
    * e.com fixture) — an unrelated short-named group can capture a
    * longer crawler token, so deploy with a distinctive leading
    * product token. Among applicable own groups the LONGEST token wins
    * (exact match is the longest possible prefix); `*` applies only
    * when no own group matches at all.
    *
    * Shape at scale: the rules table aggregates to one KB-sized rule
    * array per host (a shuffle of the RULES side only — KB per host) and
    * broadcasts; the frontier side is ONE scan with a broadcast hash
    * join and a per-row `aggregate` fold over the host's rule array —
    * the frontier is never shuffled (no window, no exchange on the URL
    * side). Output: the frontier's columns + `allowed`. */
  def robotsAllowed(
      urls: DataFrame,
      rules: DataFrame,
      userAgent: String,
      urlCol: String = "url",
      keyCol: String = "host"): DataFrame = {
    val ua = userAgent.toLowerCase
    // elect own-UA vs '*' over EVERY directive row (crawl-delay included):
    // a host whose own-UA group has no allow/disallow rules must still
    // suppress the '*' group (allow-all), not inherit its rules. Own
    // match is Google-parser product-token prefix, no boundary check
    // ("googlebot-news" obeys a "googlebot" group — see the scaladoc's
    // RFC 9309 attribution note); __sp carries the matched token LENGTH
    // so the longest applicable prefix wins the election ('*' scores 0
    // and only wins when nothing else applies)
    val elected = rules
      .filter(lit(ua).startsWith(lower(col("user_agent"))) ||
        col("user_agent") === "*")
      .withColumn("__sp", when(col("user_agent") === "*", lit(0))
        .otherwise(length(col("user_agent"))).cast("int"))
      .groupBy(col(keyCol).as("__rhost"))
      .agg(max(col("__sp")).as("__bestSp"),
        collect_list(struct(col("__sp").as("sp"),
          (col("directive") === "allow").as("allow"),
          length(col("value")).cast("int").as("len"),
          robotsPattern(col("value")).as("pat"),
          col("directive").as("dir"),
          col("value").as("v"))).as("__all"))
      .select(col("__rhost"),
        filter(col("__all"), r => r("sp") === col("__bestSp") &&
          (r("dir") === "allow" || r("dir") === "disallow") &&
          r("v") =!= "").as("__rules"))
    val u = urls.withColumn("__uhost", host(col(urlCol)))
      .withColumn("__upath", pathQuery(col(urlCol)))
    val best = aggregate(col("__rules"),
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (acc, r) => when(
        regexp_like(col("__upath"), r("pat")) &&
          (r("len") > acc("len") ||
            (r("len") === acc("len") && r("allow") && !acc("allow"))),
        struct(r("len").as("len"), r("allow").as("allow"))).otherwise(acc))
    u.join(broadcast(elected), col("__uhost") === col("__rhost"), "left")
      // no elected group for the host → null rule array → null fold → allow
      .withColumn("allowed", coalesce(best("allow"), lit(true)))
      .select(urls.columns.map(col) :+ col("allowed"): _*)
  }

  /** Recrawl scheduling over [[parseSitemap]] output + fetch history —
    * the RE-fetch leg that closes the discovery loop (parse → schedule
    * → fetch → re-fetch): each known page is `due` with a reason, in
    * precedence order:
    *   `new`      — never fetched (no history row);
    *   `modified` — the sitemap's `lastmod` DATE is after the last
    *                fetch's date (day granularity: `lastmod` is
    *                commonly date-only, and comparing a date-floor
    *                against a timestamp would re-fetch a page crawled
    *                later the same day forever). For `never` pages the
    *                comparison is `lastmod >= fetch date`: the stale
    *                interval is disabled there, so a strict `>` would
    *                leave a same-day lastmod bump permanently unseen —
    *                the one-extra same-day re-fetch (until `last_fetch`
    *                lands on a later day) is the cheap side of that
    *                trade, and other changefreq values keep `>`
    *                because their stale path eventually covers it;
    *   `stale`    — the page's `changefreq` interval has elapsed since
    *                `last_fetch` as of `asOf` (always 0s, hourly,
    *                daily, weekly, monthly 30d, yearly 365d; missing or
    *                unrecognized values pace at `defaultFreq`;
    *                `never` disables the interval — only `modified`
    *                re-fetches it);
    *   `fresh`    — otherwise (not due).
    *
    * Scale: one equi-join on the URL between two big tables (the
    * sitemap snapshot and the fetch log) — co-partition/bucket both by
    * URL at deployment scale — then pure codegen'd column arithmetic;
    * no window, no driver state.
    *
    * @param asOf ANSI timestamp literal, e.g. `2026-02-01 00:00:00`
    * @return pages' columns + (last_fetch, reason, due) */
  def recrawlDue(
      pages: DataFrame,
      history: DataFrame,
      asOf: String,
      urlCol: String = "loc",
      fetchedCol: String = "last_fetch",
      defaultFreq: String = "weekly"): DataFrame = {
    val freqSec = {
      val f = coalesce(lower(col("changefreq")), lit(defaultFreq.toLowerCase))
      when(f === "always", lit(0L))
        .when(f === "hourly", lit(3600L))
        .when(f === "daily", lit(86400L))
        .when(f === "weekly", lit(7L * 86400))
        .when(f === "monthly", lit(30L * 86400))
        .when(f === "yearly", lit(365L * 86400))
        .when(f === "never", lit(null).cast("long"))
        .otherwise(lit(7L * 86400))
    }
    // lastmod is W3C-guarded by parseSitemap but may be partial
    // (YYYY / YYYY-MM); only a full date prefix is comparable
    val modDate = when(col("lastmod").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"),
      to_date(substring(col("lastmod"), 1, 10)))
    val h = history.select(col(urlCol).as("__hu"),
      col(fetchedCol).cast("timestamp").as("last_fetch"))
    pages.join(h, col(urlCol) === col("__hu"), "left").drop("__hu")
      .withColumn("reason",
        when(col("last_fetch").isNull, "new")
          // freqSec is null exactly for changefreq='never' — the pages
          // whose only re-fetch path is this comparison (see scaladoc)
          .when(modDate.isNotNull && (modDate > to_date(col("last_fetch")) ||
            (freqSec.isNull && modDate === to_date(col("last_fetch")))),
            "modified")
          .when(freqSec.isNotNull &&
            unix_timestamp(lit(asOf).cast("timestamp")) -
              unix_timestamp(col("last_fetch")) >= freqSec, "stale")
          .otherwise("fresh"))
      .withColumn("due", col("reason") =!= "fresh")
  }
}
