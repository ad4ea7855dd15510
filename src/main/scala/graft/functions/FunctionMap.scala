package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** StreamSQL builtin-function surface → Spark Column mapping.
  *
  * Catalog derived from the reference registry (reference: functions/registry.go:72-258
  * and the per-category files functions_math.go / functions_string.go /
  * functions_conversion.go / functions_datetime.go / functions_json.go /
  * functions_hash.go / functions_array.go / functions_conditional.go /
  * functions_type.go). Everything lowers to codegen'd Spark built-ins —
  * no Scala UDFs in the hot path. Unknown names fall through to
  * `call_function`, which surfaces the entire Spark function registry
  * (a deliberate superset of the reference).
  *
  * Functions whose semantics depend on a literal argument (cast/encode/decode/
  * date_add/extract/format/...) are dispatched by the ExprBuilder, which sees the
  * AST literal; their helpers live here (`*Literal`).
  *
  * Dialect deltas handled here:
  *  - `log` is log10 in the reference (functions_math.go:419-436); `ln` is natural.
  *  - `indexof` is 0-based Go strings.Index (functions_string.go:271-289) vs
  *    Spark's 1-based instr → subtract 1.
  *  - `substring` is 0-based with negative-from-end (functions_string.go:291-315).
  *  - `stddev`/`var` are population variants; `stddevs`/`vars` are sample
  *    (functions_aggregation.go:399,813,933,1022).
  */
object FunctionMap {

  /** Aggregate function names of the dialect (reference: functions_aggregation.go). */
  val aggregateNames: Set[String] = Set(
    "sum", "avg", "min", "max", "count", "stddev", "stddevs", "var", "vars",
    "median", "percentile", "collect", "first_value", "last_value", "merge_agg",
    "deduplicate", "nth_value", "window_start", "window_end", "window_id",
    // Spark-first surface extensions (free on Catalyst):
    "count_distinct", "approx_count_distinct", "percentile_approx", "corr",
    "covar_pop", "covar_samp", "skewness", "kurtosis")

  /** Analytic (stateful/CDC) function names (reference: functions_analytical.go,
    * functions/analytic_acc.go). Lowered by the plan builder, not here. */
  val analyticNames: Set[String] = Set(
    "lag", "latest", "had_changed", "changed_col", "changed_cols",
    "acc_sum", "acc_max", "acc_min", "acc_count", "acc_avg",
    // Spark-first extensions available on the batch path:
    "lead", "row_number", "rank", "dense_rank", "ntile")

  /** Names the ExprBuilder must special-case because an argument is a
    * semantic literal (type name, format, unit, pattern). */
  val literalArgNames: Set[String] = Set(
    "cast", "encode", "decode", "date_add", "date_sub", "date_diff", "extract",
    "format", "expr", "word_ngrams")

  /** User-registered aggregate names — the analog of registering a custom
    * function under TypeAggregation (reference: functions/registry.go:12-29
    * — the category tells the planner it aggregates). */
  private val customAggregates =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def registerAggregate(name: String): Unit = customAggregates.add(name.toLowerCase)

  /** User-registered analytic state machines — the analog of implementing
    * `StatefulAnalytic.NewState() AnalyticState{Apply,Reset}`
    * (reference: stream/analytic.go:93-114, functions/analytic_state.go).
    * The factory creates one state instance per (partition key, call);
    * instances must be serializable (streaming state crosses micro-batches).
    *
    * The registry lives on the DRIVER and is process-global (like the JVM
    * side of `spark.udf`): registration is per-JVM, later registrations of
    * the same name win, `unregisterAnalytic` removes one. Operators
    * SNAPSHOT the registry at plan time and ship the factories inside
    * their closures — executor JVMs never consult this map. */
  private val customAnalytics =
    new java.util.concurrent.ConcurrentHashMap[String, (() => CustomAnalytic, Option[org.apache.spark.sql.types.DataType])]()

  def registerAnalytic(
      name: String, newState: () => CustomAnalytic,
      resultType: Option[org.apache.spark.sql.types.DataType] = None): Unit =
    customAnalytics.put(name.toLowerCase, (newState, resultType))

  def unregisterAnalytic(name: String): Unit =
    customAnalytics.remove(name.toLowerCase)

  def customAnalytic(name: String): Option[() => CustomAnalytic] =
    Option(customAnalytics.get(name.toLowerCase)).map(_._1)

  def customAnalyticResultType(name: String): Option[org.apache.spark.sql.types.DataType] =
    Option(customAnalytics.get(name.toLowerCase)).flatMap(_._2)

  /** Driver-side snapshot for shipping into operator closures. */
  def customAnalyticsSnapshot(): Map[String, () => CustomAnalytic] = {
    val b = Map.newBuilder[String, () => CustomAnalytic]
    customAnalytics.forEach((k, v) => b += (k -> v._1))
    b.result()
  }

  def isCustomAnalytic(name: String): Boolean =
    customAnalytics.containsKey(name.toLowerCase)

  def isAggregate(name: String): Boolean =
    aggregateNames.contains(name.toLowerCase) ||
      customAggregates.contains(name.toLowerCase)
  def isAnalytic(name: String): Boolean =
    analyticNames.contains(name.toLowerCase) ||
      customAnalytics.containsKey(name.toLowerCase)

  /** Scalar lowering for column-only functions. */
  def scalar(name: String, args: List[Column]): Column = {
    def a0 = args(0); def a1 = args(1); def a2 = args(2)
    name.toLowerCase match {
      // ---- math (functions_math.go) ----
      case "ln"   => log(a0)
      case "log"  => log10(a0) // reference log is base-10
      case "log2" => log2(a0)
      case "bitand" => a0.bitwiseAND(a1)
      case "bitor"  => a0.bitwiseOR(a1)
      case "bitxor" => a0.bitwiseXOR(a1)
      case "bitnot" => bitwise_not(a0)
      case "trunc" if args.size == 2 =>
        // numeric truncation toward zero (functions_conversion.go:443)
        val f = pow(lit(10.0), a1)
        signum(a0) * floor(abs(a0) * f) / f
      case "power" => pow(a0, a1)

      // ---- string (functions_string.go) ----
      case "indexof" => instr(a0, a1) - lit(1)
      case "substring" =>
        // 0-based; negative start counts from end; optional length
        val len = length(a0)
        val start0 = when(a1 < 0, greatest(len + a1, lit(0))).otherwise(a1)
        val sparkStart = (start0 + lit(1)).cast("int")
        if (args.size >= 3) substring(a0, sparkStart, a2.cast("int"))
        else substring(a0, sparkStart, lit(Int.MaxValue))
      case "regexp_matches" => call_function("rlike", a0, a1)
      case "regexp_substring" => call_function("regexp_extract", a0, a1, lit(0))
      case "endswith" => a0.endsWith(a1)
      case "startswith" => a0.startsWith(a1)

      // ---- conversion (functions_conversion.go) ----
      case "hex2dec" => conv(a0, 16, 10).cast("long")
      case "dec2hex" => lower(hex(a0.cast("long")))
      case "convert_tz" => convert_timezone(a1, a0.cast("timestamp"))
      case "to_seconds" => unix_timestamp(a0)
      case "chr" => char(a0)

      // ---- datetime (functions_datetime.go) ----
      case "now" => unix_timestamp() // reference now() returns epoch seconds
      case "current_time" => date_format(current_timestamp(), "HH:mm:ss")
      case "current_date" => current_date().cast("string")
      // 1-arg: conventional format; 2-arg: explicit pattern
      // (functions_datetime.go:375-401 — date_parse(str, format))
      case "date_parse" if args.size >= 2 => call_function("to_timestamp", a0, a1)
      case "date_parse" => to_timestamp(a0, "yyyy-MM-dd HH:mm:ss")
      case "from_unixtime" => from_unixtime(a0)

      // ---- json (functions_json.go; json_extract w/ literal path in ExprBuilder) ----
      case "from_json" if args.size == 1 =>
        // reference from_json returns a dynamic map (functions_json.go:42-69);
        // the closest static-schema form is map<string,string> — values
        // re-cast at the use site (element_at + cast)
        from_json(a0, "map<string,string>", Map.empty[String, String])
      case "json_valid" => a0.isNotNull && get_json_object(a0, "$").isNotNull
      case "json_type" => jsonType(a0)
      case "json_length" => jsonLength(a0)

      // ---- hash (functions_hash.go) ----
      case "sha256" => sha2(a0, 256)
      case "sha512" => sha2(a0, 512)

      // ---- array (functions_array.go) ----
      case "array_length" => size(a0)

      // ---- conditional (functions_conditional.go) ----
      case "if_null" | "ifnull" => coalesce(a0, a1)
      case "null_if" => nullif(a0, a1)
      case "case_when" => caseWhenChain(args)

      // ---- deterministic sampling (LLM-pipeline extension) ----
      // sample_hash(key, rate): keep ~rate of rows by the key's md5 bucket —
      // reproducible across runs/reshards (operators.Sampling.byHash in SQL)
      case "sample_hash" =>
        graft.operators.Sampling.hashBucket(a0) < (a1 * lit(10000)).cast("int")

      // ---- text curation kernels (LLM-pipeline extension): the TextOps
      // Column operators as dialect scalars, so filter rules like
      // `WHERE lang_id(text) = 'en' AND quality_score(text) > 0.7` run in
      // dialect SQL at scan speed ----
      case "lang_id" => graft.operators.TextOps.langId(a0)
      case "token_count" => graft.operators.TextOps.tokenCount(a0)
      case "token_count_bpe" => graft.operators.TextOps.tokenCountBpe(a0)
      case "quality_score" => graft.operators.TextOps.qualityScore(a0)
      case "redact_pii" => graft.operators.TextOps.redact(a0)
      case "content_fingerprint" => graft.operators.TextOps.fingerprint(a0)
      case "redact_cards" => graft.operators.TextOps.redactCards(a0)
      case "luhn_valid" => graft.operators.TextOps.luhnValid(a0)
      case "html_text" => graft.operators.HtmlOps.extractText(a0)
      case "html_title" => graft.operators.HtmlOps.title(a0)
      case "link_density" =>
        round(graft.operators.HtmlOps.anchorTextLen(a0) /
          nullif(length(graft.operators.HtmlOps.extractText(a0)), lit(0)), 6)
      case "canonical_url" => graft.operators.WebOps.canonicalUrl(a0)
      case "sentence_split" => graft.operators.TextOps.sentencesArray(a0)
      case "nfc_normalize" => graft.operators.TextOps.nfcNormalize(a0)
      case "strip_invisible" => graft.operators.TextOps.stripInvisible(a0)
      case "dehyphenate" => graft.operators.TextOps.dehyphenate(a0)
      // r13/r14 analytics kernels on the dialect surface (the SQL surface
      // is the product — operators reachable only from Scala are
      // second-class): entropy gates, repetition collapse, URL lexical
      // features, page-level crawl directives
      case "char_entropy" => graft.operators.TextOps.charEntropy(a0)
      case "word_entropy" => graft.operators.TextOps.wordEntropy(a0)
      case "collapse_repeats" => graft.operators.TextOps.collapseRepeats(a0)
      case "url_depth" => graft.operators.WebOps.pathDepth(a0)
      case "url_host" => graft.operators.WebOps.host(a0)
      case "registered_domain" => graft.operators.WebOps.registeredDomain(a0)
      case "robots_noindex" => graft.operators.HtmlOps.robotsDirective(a0, "noindex")
      case "robots_nofollow" => graft.operators.HtmlOps.robotsDirective(a0, "nofollow")
      case "html_canonical" => graft.operators.HtmlOps.canonicalLink(a0)
      case "nofollow_links" => graft.operators.HtmlOps.nofollowLinkCount(a0)
      // r14 multimodal scalars — crawled-media curation gates in dialect
      // SQL. `image_features` decodes once and returns the whole struct;
      // the single-feature forms extract from the SAME udf expression so
      // Spark's subexpression elimination shares the decode within a
      // projection. `image_format/width/height` are the header PROBE
      // (no decode — the cheap pre-decode gate, fills for codec-less
      // formats like WebP too).
      case "image_features" => graft.operators.Multimodal.imageFeaturesCol(a0)
      case "image_ok" =>
        graft.operators.Multimodal.imageFeaturesCol(a0).getField("decode_ok")
      case "image_ahash" =>
        graft.operators.Multimodal.imageFeaturesCol(a0).getField("ahash")
      case "image_dhash" =>
        graft.operators.Multimodal.imageFeaturesCol(a0).getField("dhash")
      case "image_phash" =>
        graft.operators.Multimodal.imageFeaturesCol(a0).getField("phash")
      case "image_gray_mean" =>
        graft.operators.Multimodal.imageFeaturesCol(a0).getField("gray_mean")
      case "image_format" =>
        graft.operators.Multimodal.imageProbeCol(a0).getField("format")
      case "image_width" =>
        graft.operators.Multimodal.imageProbeCol(a0).getField("width")
      case "image_height" =>
        graft.operators.Multimodal.imageProbeCol(a0).getField("height")
      case "exif_orientation" =>
        graft.operators.Multimodal.exifOrientationCol(a0)
      case "wav_stats" => graft.operators.Multimodal.wavStatsCol(a0)
      case "wav_ok" =>
        graft.operators.Multimodal.wavStatsCol(a0).isNotNull
      case "wav_rms" =>
        graft.operators.Multimodal.wavStatsCol(a0).getField("rms")
      case "wav_peak" =>
        graft.operators.Multimodal.wavStatsCol(a0).getField("peak")
      case "wav_duration_ms" =>
        graft.operators.Multimodal.wavStatsCol(a0).getField("durationMs")
      case "wav_crossings" =>
        graft.operators.Multimodal.wavStatsCol(a0).getField("zeroCrossings")
      case "wav_envelope_hash" =>
        graft.operators.Multimodal.wavEnvelopeHashCol(a0)
      // codec-free audio/video header probes: the pre-decode gates
      // (format routing, channel/rate/length filters with zero sample
      // access). Single-field forms share the one probe expression via
      // subexpression elimination, like the image_* family above.
      case "audio_probe" => graft.operators.Multimodal.audioProbeCol(a0)
      case "audio_format" =>
        graft.operators.Multimodal.audioProbeCol(a0).getField("format")
      case "audio_channels" =>
        graft.operators.Multimodal.audioProbeCol(a0).getField("channels")
      case "audio_rate" =>
        graft.operators.Multimodal.audioProbeCol(a0).getField("rate")
      case "audio_duration_ms" =>
        graft.operators.Multimodal.audioProbeCol(a0).getField("duration_ms")
      case "mp4_duration_ms" => graft.operators.Multimodal.mp4DurationCol(a0)
      case "mp3_frame_count" => graft.operators.Multimodal.mp3FrameCountCol(a0)
      // scan-based PDF text extraction (FlateDecode via the JDK's own
      // Inflater — PDFs are a first-class crawl source, like HTML)
      case "pdf_struct" => graft.operators.PdfOps.pdfTextStructCol(a0)
      case "pdf_ok" =>
        // cheap signature gate, EQUIVALENT to the full parse's None
        // condition (extractPdfText refuses only on a missing %PDF-
        // signature / short buffer): a WHERE pdf_ok(bytes) filter must
        // not pay the full inflate+scan the projection will pay again
        coalesce(length(a0) >= 8 &&
          decode(substring(a0, 1, 5), "UTF-8") === "%PDF-", lit(false))
      case "pdf_text" =>
        graft.operators.PdfOps.pdfTextStructCol(a0).getField("text")
      case "pdf_pages" =>
        graft.operators.PdfOps.pdfTextStructCol(a0).getField("pages")
      // wikitext → text (Wikipedia-dump corpora)
      case "wiki_text" => graft.operators.TextOps.wikiText(a0)
      // LaTeX source → text (arXiv corpora)
      case "latex_text" => graft.operators.TextOps.latexText(a0)
      // license gating for code corpora
      case "license_id" => graft.operators.TextOps.licenseId(a0)
      case "license_permissive" =>
        graft.operators.TextOps.licensePermissive(a0)
      // SRT/WebVTT subtitles as a text document
      case "subtitle_text" =>
        graft.operators.SubtitleOps.subtitleTextCol(a0)
      // gzip members (compressed WARC/JSONL payloads; bombs refuse to NULL)
      case "gunzip" => graft.operators.ArchiveOps.gunzipCol(a0)
      case "gunzip_text" => graft.operators.ArchiveOps.gunzipText(a0)
      case "gzip_ok" =>
        graft.operators.ArchiveOps.gunzipCol(a0).isNotNull
      // zip/EPUB archive scalars (JDK ZipInputStream; the books-corpus
      // front door — epub_text reuses the html extractor chain)
      // zip_ok / gzip_ok deliberately validate by the FULL walk (a PK
      // signature with a corrupt body must gate false) — unlike pdf_ok
      // there is no cheap equivalent, so a WHERE+SELECT pair pays the
      // walk twice; carry sniff_format as a column when that matters
      case "zip_ok" =>
        graft.operators.ArchiveOps.epubSpineCol(a0).isNotNull
      case "epub_text" => graft.operators.ArchiveOps.epubText(a0)
      case "epub_docs" =>
        graft.operators.ArchiveOps.epubSpineCol(a0).getField("n_docs")
      case "docx_text" => graft.operators.ArchiveOps.docxText(a0)
      // magic-byte sniffing + the one-call routed extractor (declared
      // content types lie; the router reads signatures)
      case "sniff_format" => graft.operators.Extract.sniffFormatCol(a0)
      case "auto_text" => graft.operators.Extract.autoText(a0)
      case "gif_anim" => graft.operators.Multimodal.gifAnimCol(a0)
      case "gif_frames" =>
        graft.operators.Multimodal.gifAnimCol(a0).getField("frames")
      case "gif_duration_ms" =>
        graft.operators.Multimodal.gifAnimCol(a0).getField("duration_ms")
      case "gif_loops" =>
        graft.operators.Multimodal.gifAnimCol(a0).getField("loops")
      // 64-bit signature Hamming distance (aHash/dHash/pHash/SimHash
      // near-dup verify as a WHERE gate) — pure builtins, codegen'd
      case "hamming64" => bit_count(a0.bitwiseXOR(a1))

      // ---- type predicates (functions_type.go) ----
      case "is_null" => a0.isNull
      case "is_not_null" => a0.isNotNull
      case "is_numeric" => a0.cast("double").isNotNull
      case "is_string" => typeof(a0) === "string"
      case "is_bool" => typeof(a0) === "boolean"
      case "is_array" => typeof(a0).startsWith("array")
      case "is_object" => typeof(a0).startsWith("struct") || typeof(a0).startsWith("map")

      // ---- everything else: direct Spark registry passthrough ----
      case other =>
        // plan-time existence check with a typo suggestion (reference:
        // docs/FUNCTION_VALIDATION.md — ErrorTypeUnknownFunction): an
        // unknown name would otherwise surface as a raw analysis error
        // deep inside the first action. Session catalog covers builtins
        // AND spark.udf-registered customs.
        val exists = org.apache.spark.sql.SparkSession.getActiveSession
          .forall(_.catalog.functionExists(other))
        if (!exists) {
          val hint = suggest(other).map(s => s" Did you mean '$s'?").getOrElse("")
          throw new IllegalArgumentException(
            s"Unknown function '$other'.$hint Register custom functions " +
              "via StreamSql.registerFunction / registerAggregator / registerAnalytic.")
        }
        call_function(other, args: _*)
    }
  }

  /** Nearest known function name within edit distance 2, for the
    * unknown-function error message. */
  private def suggest(name: String): Option[String] = {
    def dist(a: String, b: String): Int = {
      if (math.abs(a.length - b.length) > 2) return 3
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val candidates = aggregateNames ++ analyticNames ++
      org.apache.spark.sql.SparkSession.getActiveSession.toSeq
        .flatMap(_.catalog.listFunctions().collect().map(_.name.toLowerCase).toSeq)
    candidates.map(c => c -> dist(name, c)).filter(_._2 <= 2)
      .minByOption(_._2).map(_._1)
  }

  /** `format(v, '0.00')`-style numeric formatting with a literal pattern
    * (functions_string.go:156-216): %.Nf where N = digits after '.'. */
  def formatWithPattern(v: Column, pattern: String): Column = {
    val precision = if (pattern.contains('.')) pattern.split("\\.")(1).length else 0
    format_string(s"%.${precision}f", v.cast("double"))
  }

  /** cast(x, 'int'|'int64'|'float'|'string'|'bool') (functions_conversion.go:22-71). */
  def castToLiteral(v: Column, ty: String): Column = ty.toLowerCase match {
    case "int" | "int32" | "bigint" | "int64" | "long" => v.cast("long")
    case "float" | "float64" | "double"                => v.cast("double")
    case "string"                                      => v.cast("string")
    case "bool" | "boolean"                            => v.cast("boolean")
    case other                                         => v.cast(other)
  }

  def encodeAsLiteral(v: Column, fmt: String): Column = fmt.toLowerCase match {
    case "base64" => base64(v.cast("binary"))
    case "hex"    => lower(hex(v))
    case other    => throw new IllegalArgumentException(s"encode: unknown format $other")
  }

  def decodeAsLiteral(v: Column, fmt: String): Column = fmt.toLowerCase match {
    case "base64" => unbase64(v).cast("string")
    case "hex"    => unhex(v).cast("string")
    case other    => throw new IllegalArgumentException(s"decode: unknown format $other")
  }

  /** date_add(date, n, unit) over string timestamps, returning a formatted string
    * (functions_datetime.go:101-175). */
  def dateAddLiteral(d: Column, n: Column, unit: String): Column = {
    val ts = d.cast("timestamp")
    val res = unit.toLowerCase.stripSuffix("s") match {
      case "year"   => add_months(ts, n * 12).cast("timestamp")
      case "month"  => add_months(ts, n).cast("timestamp")
      case "day"    => timestamp_add("DAY", n, ts)
      case "hour"   => timestamp_add("HOUR", n, ts)
      case "minute" => timestamp_add("MINUTE", n, ts)
      case "second" => timestamp_add("SECOND", n, ts)
      case other    => throw new IllegalArgumentException(s"date_add: unit $other")
    }
    date_format(res, "yyyy-MM-dd HH:mm:ss")
  }

  /** date_diff(a, b [,unit]) = a - b (functions_datetime.go:242-305). */
  def dateDiffLiteral(a: Column, b: Column, unit: String): Column = {
    val (ta, tb) = (a.cast("timestamp"), b.cast("timestamp"))
    unit.toLowerCase.stripSuffix("s") match {
      case "second" => unix_timestamp(ta) - unix_timestamp(tb)
      case "minute" => ((unix_timestamp(ta) - unix_timestamp(tb)) / 60).cast("long")
      case "hour"   => ((unix_timestamp(ta) - unix_timestamp(tb)) / 3600).cast("long")
      case "day"    => datediff(ta, tb).cast("long")
      case "month"  => months_between(ta, tb).cast("long")
      case "year"   => (months_between(ta, tb) / 12).cast("long")
      case other    => throw new IllegalArgumentException(s"date_diff: unit $other")
    }
  }

  def extractLiteral(unit: String, ts: Column): Column = {
    val t = ts.cast("timestamp")
    unit.toLowerCase match {
      case "year" => year(t); case "month" => month(t); case "day" => dayofmonth(t)
      case "hour" => hour(t); case "minute" => minute(t); case "second" => second(t)
      case "dow" | "dayofweek" => dayofweek(t)
      case "doy" | "dayofyear" => dayofyear(t)
      case "week" => weekofyear(t)
      case other => throw new IllegalArgumentException(s"extract: field $other")
    }
  }

  def jsonType(j: Column): Column = {
    val t = ltrim(j)
    when(j.isNull, lit(null).cast("string"))
      .when(t.startsWith("{"), "object")
      .when(t.startsWith("["), "array")
      .when(t.startsWith("\""), "string")
      .when(t === "true" || t === "false", "boolean")
      .when(t === "null", "null")
      .when(t.cast("double").isNotNull, "number")
      .otherwise(lit(null).cast("string"))
  }

  def jsonLength(j: Column): Column = {
    val t = ltrim(j)
    when(t.startsWith("["), json_array_length(j))
      .when(t.startsWith("{"), size(json_object_keys(j)))
      .otherwise(lit(null).cast("int"))
  }

  def caseWhenChain(args: List[Column]): Column = {
    // case_when(cond1, v1, cond2, v2, ..., [default]) (functions_conditional.go:196)
    val pairs = args.grouped(2).toList
    val (branches, default) =
      if (args.size % 2 == 1) (pairs.init, Some(args.last)) else (pairs, None)
    val start = when(branches.head.head, branches.head(1))
    val chained = branches.tail.foldLeft(start)((acc, p) => acc.when(p.head, p(1)))
    default.map(chained.otherwise).getOrElse(chained)
  }
}
