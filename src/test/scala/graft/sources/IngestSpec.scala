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

  test("WARC round trip: framing survives embedded fake headers, bytes, empties") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "plain body"),
      // payload embedding a complete fake record — blank-line splitting
      // would emit it as an extra record; Content-Length framing must not
      (2L, "x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"),
      (3L, "héllo – ümlaut 😀"), // multi-byte: CL counts BYTES
      (4L, ""),
      (5L, "trailing\r\n\r\n")).toDF("doc_id", "text")
    val files = docs
      .withColumn("rec", Ingest.warcRecord(lit("response"),
        concat(lit("http://t/"), col("doc_id")), lit("2026-01-01"), col("text")))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("rec")))),
        x => x.getField("rec")), "").as("content"))
    val out = Ingest.warc(files, "content")
      .orderBy("rec_index")
      .select("rec_index", "warc_type", "target_uri", "content_length", "payload")
      .collect()
    assert(out.length == 5, out.mkString("\n"))
    val expect = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    out.zip(expect).foreach { case (row, (id, text)) =>
      assert(row.getInt(0) == (id - 1).toInt)
      assert(row.getString(1) == "response")
      assert(row.getString(2) == s"http://t/$id")
      assert(row.getLong(3) ==
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
      assert(row.getString(4) == text, s"payload mismatch for doc $id")
    }
  }

  test("WARC malformed tails: truncated payload and missing Content-Length") {
    import org.apache.spark.sql.functions._
    // truncated: header claims 100 bytes, only 5 present → one record with
    // the available payload, walk ends (nothing invented)
    val truncated = Seq(
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nshort")
      .toDF("content")
    val t = Ingest.warc(truncated, "content").collect()
    assert(t.length == 1 && t(0).getAs[String]("payload") == "short")
    assert(t(0).getAs[Long]("content_length") == 100L)
    // missing Content-Length: record is unframed → rest of file is payload
    val unframed = Seq(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nrest\r\n\r\nWARC/1.0\r\n\r\nx")
      .toDF("content")
    val u = Ingest.warc(unframed, "content").collect()
    assert(u.length == 1 && u(0).getAs[String]("payload").startsWith("rest"))
  }

  test("WARC fields parse from the header block only, line-anchored") {
    import org.apache.spark.sql.functions._
    // an X-Content-Length header and HTTP headers inside the payload must
    // not leak into the WARC fields — the extraction must see exactly the
    // region (header block) and anchoring (line start) the framing uses
    val payload = "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n" +
      "Content-Length: 7\r\n\r\nit's me"
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "X-Content-Length: 5\r\nX-WARC-Type: fake\r\n" +
      "Content-Type: application/http\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"
    val out = Ingest.warc(Seq(rec).toDF("content"), "content").collect()
    assert(out.length == 1, out.mkString("\n"))
    assert(out(0).getAs[String]("warc_type") == "response")
    assert(out(0).getAs[String]("content_type") == "application/http")
    assert(out(0).getAs[Long]("content_length") == payload.getBytes("UTF-8").length)
    assert(out(0).getAs[String]("payload") == payload)
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
