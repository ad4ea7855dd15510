package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object SparkTestBase {

  /** Stop a streaming query with teardown noise suppressed: stopping a
    * query whose processing-time trigger has a micro-batch in flight
    * aborts that batch's tasks, and the state-store commit path logs
    * CANNOT_COMMIT stack traces at ERROR even though the abort is the
    * expected outcome of stop(). Logging is masked only for the stop
    * window (stop() waits for the stream thread to terminate, so the
    * task-abort logs land inside it) — steady-state errors still print. */
  def stopQuietly(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val sc = spark.sparkContext
    sc.setLogLevel("OFF")
    try q.stop()
    finally {
      // executor-side task-completion listeners can outlive the stream
      // thread stop() joins on (observed: a state-cleanup listener logging
      // FileNotFound ~ms after stop returns); give stragglers a beat
      // before re-arming ERROR logging
      Thread.sleep(300)
      sc.setLogLevel("ERROR")
    }
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // rapid micro-batches (processing-time timeouts) can deadlock the
      // 4.1 checksum checkpoint manager's await inside state commits
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
