package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Schema-validated ingestion (reference: schema/schema.go,
  * streamsql.go:227-236 — invalid rows dropped and counted). */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("deviceId", StringType),
    StructField("temperature", DoubleType)))

  test("invalid JSON rows are dropped and counted via observation") {
    val df = Seq(
      """{"deviceId":"d1","temperature":21.5}""",
      """not json at all""",
      """{"deviceId":"d2","temperature":30.0}""").toDF("payload")
    val (out, obs) = Ingest.jsonObserved(df, "payload", schema)
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("d1", 21.5), ("d2", 30.0)))
    val m = obs.get
    assert(m("invalid") == 1L && m("total") == 3L, m)
  }

  test("CSV lines parse against the declared schema; malformed lines drop") {
    val df = Seq(
      "d1,21.5",
      "totally,not,a,row,with,matching,shape",
      "d2,30.0",
      "d3,not_a_number").toDF("line")
    val out = Ingest.csv(df, "line", schema)
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("d1", 21.5), ("d2", 30.0)))
  }

  test("streaming ingestion drops invalid rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val out = Ingest.json(mem.toDF().toDF("payload"), "payload", schema)
    val q = out.writeStream.format("memory").queryName("ingestout")
      .outputMode("append").start()
    mem.addData("""{"deviceId":"d1","temperature":1.0}""", "broken", "{}")
    q.processAllAvailable()
    q.stop()
    // "{}" parses to an all-null struct (valid JSON) — only "broken" drops
    assert(spark.table("ingestout").count() == 2)
  }
}
