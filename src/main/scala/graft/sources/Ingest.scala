package graft.sources

import org.apache.spark.sql.{DataFrame, Observation}
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
}
