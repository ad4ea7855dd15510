package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.Parser
import graft.plan.PlanBuilder

/** Public facade of the engine — the Spark-native analog of the reference's
  * `streamsql.Streamsql` entry point (reference: streamsql.go:139-199
  * Execute / RegisterTable).
  *
  * Batch: `GraftEngine.sql(query, tables)` → DataFrame.
  * Streaming: pass streaming DataFrames as the stream table; the same plan
  * builder produces a streaming plan (windows become event-time windows with
  * watermarks — see graft.streaming).
  */
object GraftEngine {

  /** Execute a dialect query against registered tables. The `FROM` name
    * (conventionally `stream`) keys into `tables`; JOINs resolve lookup
    * tables from the same map (reference: streamsql.go:490-515 RegisterTable). */
  def sql(query: String, tables: Map[String, DataFrame]): DataFrame = {
    val stmt = Parser.parseStatement(query)
    val builder = new PlanBuilder(tables)
    stmt.ops.foldLeft(builder.build(stmt.head)) { case (acc, part) =>
      val rhs = builder.build(part.q)
      part.op match {
        case "UNION"     => if (part.all) acc.union(rhs) else acc.union(rhs).distinct()
        case "INTERSECT" => if (part.all) acc.intersectAll(rhs) else acc.intersect(rhs)
        case "EXCEPT"    => if (part.all) acc.exceptAll(rhs) else acc.except(rhs)
      }
    }
  }

  /** Convenience: single-stream form. */
  def sql(query: String, stream: DataFrame): DataFrame =
    sql(query, Map("stream" -> stream))
}

/** Loads the driver-generated test tables (TESTDATA.md) and registers them
  * under their file names, with the `events` table doubling as `stream`. */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects natively;
    // read it as a long and convert (integer division — ns epoch overflows
    // double precision).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val m = names.map { n =>
      var df = spark.read.parquet(s"$sfDir/$n.parquet")
      if (n == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
        df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      n -> df
    }.toMap
    m + ("stream" -> m("events"))
  }
}
