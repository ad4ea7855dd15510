package graft.streaming

import org.scalatest.{BeforeAndAfterAll, Suite}
import graft.SparkTestBase

/** Runs a whole suite with the RocksDB state-store provider set on the
  * shared session — state-backend parity is part of the scale story (the
  * default HDFS-backed provider holds state in executor heap; RocksDB is
  * the bounded-memory backend a 100k+-key deployment runs on). Restores
  * the previous provider afterwards so sibling suites keep their default.
  */
trait WithRocksDbStateStore extends BeforeAndAfterAll { self: Suite =>
  private var prev: Option[String] = None
  override def beforeAll(): Unit = {
    super.beforeAll()
    val spark = SparkTestBase.spark
    prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    graft.api.StreamSql(spark).useRocksDBStateStore()
  }
  override def afterAll(): Unit = {
    val spark = SparkTestBase.spark
    prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    super.afterAll()
  }
}

/** Full streaming suite on RocksDB (flatMapGroupsWithState + windows +
  * sinks + watermark/lateness paths all exercise the provider). */
class RocksDbStreamingSpec extends StreamingSpec with WithRocksDbStateStore

/** Streaming/batch parity on RocksDB: identical results regardless of the
  * state backend. */
class RocksDbStreamBatchParitySpec extends StreamBatchParitySpec
  with WithRocksDbStateStore
