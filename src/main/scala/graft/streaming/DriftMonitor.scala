package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Profile

/** Streaming drift monitor: score every ingest micro-batch's numeric
  * columns against a FIXED reference snapshot's PSI model
  * ([[Profile.psiFit]] — quantile edges + reference census, a
  * driver-sized model).
  *
  * The model is deliberately static for the life of the stream: drift is
  * defined against the reference the corpus was accepted on; refitting
  * per batch would chase the drift it is supposed to expose. Re-seed the
  * stream with a fresh model when the reference is re-baselined.
  *
  * Per micro-batch: ONE census scan of the batch (bounded
  * cols × buckets aggregation) joined onto the model's literal spine —
  * by construction identical to running [[Profile.psiAgainst]] on the
  * batch (the parity spec pins that). `emit` receives the per-(column,
  * bucket) PSI detail and the batch id; roll up with
  * [[Profile.psiSummary]] and alert on the score (rule of thumb:
  * > 0.25 = distribution break).
  */
object DriftMonitor {

  def psiStream(
      stream: DataFrame,
      model: Profile.PsiModel)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      emit(Profile.psiAgainst(batch, model), batchId)
    }
}
