package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-validated ingestion — the analog of the reference's opt-in schema
  * system (reference: schema/schema.go:30-43 — declared fields; invalid
  * rows dropped with a throttled warning, streamsql.go:227-236).
  *
  * Spark-first shape: `from_json` with a declared `StructType` plus a
  * corrupt-record column marks malformed payloads; invalid rows are
  * dropped, and the drop/total
  * counts flow through `Dataset.observe` — no driver-side mutable state, so
  * the counting works identically on batch and streaming plans (read the
  * metric from `QueryProgress.observedMetrics(name)` per micro-batch, or
  * from an [[org.apache.spark.sql.Observation]] in batch).
  */
object Ingest {

  /** Parse a JSON-string column against `schema`, drop rows that fail to
    * parse, and expose `invalid`/`total` counts as the observed metric
    * `metricName`. Output columns are the schema's fields. */
  private val corruptCol = "_ingest_corrupt"

  private def parse(df: DataFrame, jsonCol: String, schema: StructType) = {
    // PERMISSIVE from_json yields an all-null struct for malformed input —
    // a corrupt-record column is the reliable malformed-row signal
    val parseSchema = schema.add(corruptCol, StringType)
    df.withColumn("__parsed",
      from_json(col(jsonCol), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
  }

  private def invalid = col("__parsed").isNull ||
    col(s"__parsed.$corruptCol").isNotNull

  /** Shared validation tail: observe invalid/total, drop malformed rows,
    * project the declared fields — one definition for every format. */
  private def validated(parsed: DataFrame, schema: StructType,
      metricName: String): DataFrame =
    parsed
      .observe(metricName,
        count(when(invalid, 1)).as("invalid"),
        count(lit(1)).as("total"))
      .filter(!invalid)
      .select(schema.fieldNames.toIndexedSeq.map(n => col(s"__parsed.$n")): _*)

  def json(df: DataFrame, jsonCol: String, schema: StructType,
      metricName: String = "ingest"): DataFrame =
    validated(parse(df, jsonCol, schema), schema, metricName)

  /** Batch variant returning an [[Observation]] handle: `obs.get("invalid")`
    * blocks until the first action materializes the counts. */
  def jsonObserved(df: DataFrame, jsonCol: String, schema: StructType)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val out = parse(df, jsonCol, schema)
      .observe(obs,
        count(when(invalid, 1)).as("invalid"),
        count(lit(1)).as("total"))
      .filter(!invalid)
      .select(schema.fieldNames.toIndexedSeq.map(n => col(s"__parsed.$n")): _*)
    (out, obs) // Observation variant: observe() needs the handle, not a name
  }

  /** Parse a delimited-text column against `schema` (CSV line per row),
    * drop malformed rows, observe `invalid`/`total` — the CSV twin of
    * [[json]] for line-oriented feeds. `from_csv` is codegen'd; works on
    * batch and streaming frames alike. */
  def csv(df: DataFrame, lineCol: String, schema: StructType,
      delimiter: String = ",", metricName: String = "ingest"): DataFrame = {
    val parseSchema = schema.add(corruptCol, StringType)
    val parsed = df.withColumn("__parsed",
      from_csv(col(lineCol), parseSchema,
        Map("sep" -> delimiter, "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)))
    validated(parsed, schema, metricName)
  }

  // -------------------------------------------------------------------- WARC

  /** One serialized WARC/1.0 record (reversed by [[warc]]). Content-Length
    * frames the payload in BYTES (`octet_length`), per the spec — char
    * counting would corrupt every non-ASCII crawl page downstream. */
  def warcRecord(warcType: Column, targetUri: Column, warcDate: Column,
      payload: Column, contentType: Column = lit("text/plain")): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: "), warcType,
      lit("\r\nWARC-Target-URI: "), targetUri,
      lit("\r\nWARC-Date: "), warcDate,
      lit("\r\nContent-Type: "), contentType,
      lit("\r\nContent-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))

  /** Explode a column of WARC-file content into parsed records — the
    * web-crawl ingestion surface (Common-Crawl-shaped archives feed the
    * curation pipeline through exactly this step).
    *
    * The Content-Length-aware record framing runs as a one-pass scan
    * kernel ([[graft.functions.TextKernels.warcSplit]] — blank-line
    * splitting would shatter any payload embedding `\r\n\r\n` or a fake
    * header); the per-record header fields then parse with ordinary
    * regexes, so everything stays inside the file scan: no shuffle, and a
    * downstream filter on e.g. `warc_type = 'response'` prunes before any
    * payload moves. Header fields missing from a record parse as empty
    * string / null length — the caller's filter decides.
    *
    * Output: the input's other columns + (rec_index, warc_type, target_uri,
    * warc_date, content_type, content_length, payload). */
  def warc(df: DataFrame, contentCol: String): DataFrame = {
    // fields parse from the HEADER BLOCK only (before the first \r\n\r\n),
    // line-anchored — exactly the region and anchoring the framing kernel
    // uses for Content-Length, so the reported fields can never disagree
    // with the byte framing (an 'X-Content-Length:' header or a
    // 'Content-Type:' line inside an HTTP-response payload must not leak
    // into the WARC fields)
    val hdr = (name: String) =>
      regexp_extract(col("__hdr"), "(?im)^" + name + ":[ \\t]*([^\\r\\n]*)", 1)
    df.select(col("*"),
        posexplode(graft.functions.TextKernels.warcSplitCol(col(contentCol)))
          .as(Seq("rec_index", "__rec")))
      .drop(contentCol)
      .withColumn("__hdr", when(locate("\r\n\r\n", col("__rec")) > 0,
        col("__rec").substr(lit(1), locate("\r\n\r\n", col("__rec")) - 1))
        .otherwise(col("__rec")))
      .withColumn("warc_type", hdr("WARC-Type"))
      .withColumn("target_uri", hdr("WARC-Target-URI"))
      .withColumn("warc_date", hdr("WARC-Date"))
      .withColumn("content_type", hdr("Content-Type"))
      .withColumn("content_length", // '' when absent: null, not an ANSI cast error
        when(hdr("Content-Length") =!= "", hdr("Content-Length")).cast("long"))
      .withColumn("payload", when(locate("\r\n\r\n", col("__rec")) > 0,
        col("__rec").substr(
          locate("\r\n\r\n", col("__rec")) + lit(4), length(col("__rec")))))
      .drop("__rec", "__hdr")
  }
}
