package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row}
import graft.sql.{OrderItem, Ident}

/** Sink adapters mirroring the reference's result-delivery surface
  * (reference: streamsql.go:406-488 — AddSink callbacks, ToChannel,
  * PrintTable). In Spark the natural shape is `foreachBatch`; per-batch
  * ORDER BY/LIMIT (reference: stream/sorter.go:11-35 — sorting applies to
  * each emitted batch, not globally) live here, not in the unbounded plan.
  */
object Sinks {

  /** foreachBatch with the reference's per-batch ORDER BY/LIMIT applied. */
  def orderedBatches(
      df: DataFrame,
      orderBy: List[OrderItem] = Nil,
      limit: Option[Int] = None)(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      var b = batch
      if (orderBy.nonEmpty)
        b = b.orderBy(orderBy.map(oi => {
          val c = col(oi.expr.asInstanceOf[Ident].raw)
          if (oi.asc) c.asc else c.desc
        }): _*)
      limit.foreach(n => b = b.limit(n))
      f(b, id)
    }

  /** Callback sink: the Spark analog of AddSink(fn). */
  def addSink(df: DataFrame)(f: Seq[Row] => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      f(batch.collect().toSeq)
    }

  /** In-memory queryable sink (ToChannel analog) — returns the started
    * query; results accumulate in the named temp view. */
  def toMemory(df: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Console table sink (PrintTable analog). */
  def printTable(df: DataFrame): StreamingQuery =
    df.writeStream.format("console").outputMode("append").start()
}
