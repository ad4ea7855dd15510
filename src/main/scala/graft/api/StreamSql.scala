package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.GraftEngine
import graft.streaming.Sinks

/** User-facing facade — the Spark-native analog of the reference's
  * `streamsql.Streamsql` object (reference: streamsql.go):
  *
  * | reference                      | here                                  |
  * |--------------------------------|---------------------------------------|
  * | `New(); Execute(sql)`          | `StreamSql(spark).execute(sql)`       |
  * | `Emit(map)` push               | register a streaming source (Kafka/   |
  * |                                | file/MemoryStream) as `stream`        |
  * | `EmitSync` single-row          | `execute` over a 1-row batch DF       |
  * | `RegisterTable` (:490-515)     | `registerTable(name, df)`             |
  * | `AddSink(fn)` (:406-424)       | `addSink(df)(fn)`                     |
  * | `ToChannel` (:483-488)         | `toMemory(df, name)` + spark.table    |
  * | `PrintTable` (:446-457)        | `printTable(df)` / `df.show()`        |
  * | `RegisterCustomFunction`       | `registerFunction` → Spark UDF        |
  * |   (functions/registry.go:238)  |   registry (dialect resolves through  |
  * |                                |   call_function fallback)             |
  * | custom `AggregatorFunction`    | `registerAggregator` → Spark          |
  * |   (functions/aggregator_types) |   `Aggregator` + `functions.udaf`     |
  */
final class StreamSql(val spark: SparkSession) {
  private var tables: Map[String, DataFrame] = Map.empty

  /** Register a lookup/source table (reference: streamsql.go:490-515).
    * A streaming DataFrame registered as `stream` makes `execute` produce
    * streaming plans. */
  def registerTable(name: String, df: DataFrame): this.type = {
    tables += (name -> df)
    df.createOrReplaceTempView(name)
    this
  }

  /** Replace a table's contents (reference UpsertTable, streamsql.go:520-534
    * — Spark stream-static joins re-plan the static side per micro-batch, so
    * a re-registered table is picked up naturally). */
  def upsertTable(name: String, df: DataFrame): this.type = registerTable(name, df)

  /** Compile and run a dialect query (reference Execute, streamsql.go:139-199).
    * Batch sources yield a batch DataFrame; a streaming `stream` source
    * yields an unbounded DataFrame to hand to a sink below. */
  def execute(sql: String): DataFrame = GraftEngine.sql(sql, tables)

  /** Per-batch callback sink (reference AddSink, streamsql.go:406-424). */
  def addSink(df: DataFrame)(f: Seq[Row] => Unit): DataStreamWriter[Row] =
    Sinks.addSink(df)(f)

  def toMemory(df: DataFrame, name: String) = Sinks.toMemory(df, name)
  def printTable(df: DataFrame) = Sinks.printTable(df)

  /** Back streaming state (windows, stateful ops, CEP buffers) with the
    * RocksDB state store — bounded heap at 100k+ key scale, the Spark
    * counterpart of the reference's partition-capacity story
    * (README.md:21,187 — "100k+ device partitions in 128 MB"). Set before
    * starting queries; per-query override via the same conf on the writer. */
  def useRocksDBStateStore(): this.type = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    this
  }

  /** Per-query runtime stats — the GetStats/GetDetailedStats analog
    * (reference: stream/metrics.go): `metrics.getStats(query)` returns
    * input/output/dropped row counts, batch count and process rate. */
  def metrics: graft.streaming.StreamMetrics =
    graft.streaming.StreamMetrics(spark)

  /** One-line scalar UDF, immediately callable in dialect SQL — unknown
    * function names resolve through Spark's registry
    * (reference RegisterCustomFunction, functions/registry.go:238-258). */
  def registerFunction[A, R](name: String, f: A => R)(implicit
      ta: reflect.runtime.universe.TypeTag[A],
      tr: reflect.runtime.universe.TypeTag[R]): this.type = {
    spark.udf.register(name, f)
    this
  }

  def registerFunction2[A, B, R](name: String, f: (A, B) => R)(implicit
      ta: reflect.runtime.universe.TypeTag[A],
      tb: reflect.runtime.universe.TypeTag[B],
      tr: reflect.runtime.universe.TypeTag[R]): this.type = {
    spark.udf.register(name, f)
    this
  }

  /** Custom analytic state machine — the analog of implementing
    * `StatefulAnalytic.NewState() AnalyticState{Apply}`
    * (reference: stream/analytic.go:93-114, functions/analytic_state.go).
    * Callable in dialect SQL with `OVER (PARTITION BY … [WHEN …])`; one
    * state instance per partition key; the result column is `resultType`
    * (default double — custom machines fold through numeric state).
    * Batch queries run it through the same per-key state machines as
    * streaming (no window-function lowering exists for arbitrary user
    * state). The registry is JVM-global like `spark.udf`'s underlying
    * registry: later registrations of a name win, and queries capture the
    * factory at PLAN time (re-registering does not affect running
    * queries); `unregisterAnalytic` removes a name. */
  def registerAnalytic(
      name: String, newState: () => graft.functions.CustomAnalytic,
      resultType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.DoubleType): this.type = {
    graft.functions.FunctionMap.registerAnalytic(name, newState, Some(resultType))
    this
  }

  def unregisterAnalytic(name: String): this.type = {
    graft.functions.FunctionMap.unregisterAnalytic(name)
    this
  }

  /** Custom aggregate — the analog of implementing AggregatorFunction
    * {New, Add, Result} (reference: functions/aggregator_types.go:74-80). */
  def registerAggregator[IN: reflect.runtime.universe.TypeTag, BUF, OUT](
      name: String, agg: Aggregator[IN, BUF, OUT]): this.type = {
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(agg))
    graft.functions.FunctionMap.registerAggregate(name) // planner: aggregates
    this
  }
}

object StreamSql {
  def apply(spark: SparkSession): StreamSql = new StreamSql(spark)
}
