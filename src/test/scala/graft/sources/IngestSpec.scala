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
    SparkTestBase.stopQuietly(q)
    // "{}" parses to an all-null struct (valid JSON) — only "broken" drops
    assert(spark.table("ingestout").count() == 2)
  }

  test("StreamMetrics accumulates input/output/dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = graft.streaming.StreamMetrics(spark)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val out = Ingest.json(mem.toDF().toDF("payload"), "payload", schema)
    val q = out.writeStream.format("memory").queryName("metricsout")
      .outputMode("append").start()
    mem.addData("""{"deviceId":"d1","temperature":1.0}""", "broken")
    q.processAllAvailable()
    mem.addData("""{"deviceId":"d2","temperature":2.0}""", "alsobroken", "nope")
    q.processAllAvailable()
    // listener events are async relative to processAllAvailable
    val deadline = System.currentTimeMillis() + 10000
    def st = metrics.stats(q)
    while (st.inputCount < 5 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    SparkTestBase.stopQuietly(q)
    val s = st
    assert(s.inputCount == 5, s)
    assert(s.outputCount == 2, s)   // two valid rows reach the sink
    assert(s.droppedCount == 3, s)  // three malformed payloads dropped
    assert(s.batchCount >= 2, s)
    assert(metrics.getStats(q)("input_count") == 5L)
  }
}
