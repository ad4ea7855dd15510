package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Z-order clustering-key semantics and the zorderBy layout contract. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val li = Tables.load(spark, "/root/testdata/sf0.001")("lineitem")

  /** Local reference: rescale + interleave, mirroring the operator's
    * documented exact-long arithmetic. */
  private def refKey(vals: Seq[Long], ranges: Seq[(Long, Long)], bits: Int): Long = {
    val maxB = (1L << bits) - 1
    val b = vals.zip(ranges).map { case (x, (lo, hi)) =>
      (x - lo) * maxB / math.max(1L, hi - lo)
    }
    var z = 0L
    for (bit <- 0 until bits; j <- b.indices)
      z |= ((b(j) >> bit) & 1L) << (bit * b.length + j)
    z
  }

  test("zorderKey matches the local reference interleave on lineitem") {
    val cols = Seq("l_partkey", "l_suppkey", "l_orderkey")
    val mm = li.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey"),
      min("l_orderkey"), max("l_orderkey")).head()
    val ranges = (0 until 3).map(i => (mm.getLong(2 * i), mm.getLong(2 * i + 1)))
    val out = Packing.zorderKey(li, cols, bits = 6)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"), col("zkey"))
      .collect()
    assert(out.length == li.count())
    out.foreach { r =>
      val vals = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == refKey(vals, ranges, 6), s"row $vals")
    }
  }

  test("zorderKey: nearby points share key prefixes, far points do not") {
    // monotone locality sanity: the all-min row keys to 0, the all-max
    // row keys to the maximum interleave
    val df = Seq((0L, 0L), (99L, 99L)).toDF("a", "b")
    val keys = Packing.zorderKey(df, Seq("a", "b"), bits = 4)
      .orderBy("a").select("zkey").as[Long].collect()
    assert(keys(0) == 0L)
    assert(keys(1) == (1L << 8) - 1) // all 8 interleaved bits set
  }

  test("zorderBy is a permutation with disjoint per-partition key ranges") {
    val laid = Packing.zorderBy(li, Seq("l_partkey", "l_suppkey"),
      bits = 8, numParts = 5, keepKey = true)
    // permutation: same multiset of row identities
    assert(laid.count() == li.count())
    assert(laid.select("l_orderkey", "l_linenumber").distinct().count() ==
      li.select("l_orderkey", "l_linenumber").distinct().count())
    // range partitioning: per-partition [min,max] zkey windows are disjoint
    val spans = laid
      .select(spark_partition_id().as("pid"), col("zkey"))
      .groupBy("pid").agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .orderBy("lo").collect()
    spans.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getLong(2) <= w(1).getLong(1),
          s"overlapping partitions: ${w.toSeq}")
    }
    // the layout tightens per-partition min/max on the FIRST dimension
    // too (a single-column sort would only tighten its own column):
    // partitions that do not straddle a Morton quadrant boundary must
    // cover a strict subset of the global partkey range
    val global = li.agg(max("l_partkey") - min("l_partkey")).head().getLong(0)
    val pkSpans = laid.select(spark_partition_id().as("pid"), col("l_partkey"))
      .groupBy("pid").agg((max("l_partkey") - min("l_partkey")).as("span"))
      .as[(Int, Long)].collect().map(_._2)
    assert(pkSpans.count(_ < global) >= 2,
      s"z-layout left partkey unclustered: ${pkSpans.toSeq} vs global $global")
  }

  test("zorderWrite materializes a pruning-friendly layout: per-file spans tighten on every dimension") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    val path = new java.io.File(dir, "li").getAbsolutePath
    Packing.zorderWrite(li, path, Seq("l_partkey", "l_suppkey"),
      bits = 8, numParts = 6)
    val back = spark.read.parquet(path)
    assert(back.count() == li.count())
    assert(back.columns.toSet == li.columns.toSet) // zkey dropped
    // per-FILE min/max on the first clustering dimension must be a
    // strict subset of the global range for most files (the property
    // parquet row-group pruning exploits)
    val spans = back.select(input_file_name().as("f"), col("l_partkey"))
      .groupBy("f").agg((max("l_partkey") - min("l_partkey")).as("span"))
      .as[(String, Long)].collect().map(_._2)
    val global = li.agg(max("l_partkey") - min("l_partkey"))
      .head().getLong(0)
    assert(spans.length >= 5, s"expected ~6 files, got ${spans.length}")
    assert(spans.count(_ < global) >= 2,
      s"no per-file tightening: ${spans.toSeq} vs $global")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("zorderKey null and validation behavior") {
    val df = Seq((Some(1L), 2L), (None, 5L)).toDF("a", "b")
    val keys = Packing.zorderKey(df, Seq("a", "b"), bits = 4)
      .select("zkey").collect()
    assert(keys.count(_.isNullAt(0)) == 1)
    intercept[IllegalArgumentException] {
      Packing.zorderKey(li, Seq("l_partkey"), bits = 0)
    }
    intercept[IllegalArgumentException] {
      Packing.zorderKey(li, Seq.empty, bits = 8)
    }
    intercept[IllegalArgumentException] {
      Packing.zorderKey(li, Seq("l_partkey", "l_suppkey", "l_orderkey",
        "l_partkey"), bits = 16)
    }
    // an all-NULL clustering column fails with a diagnostic, not an NPE
    val allNull = Seq((None: Option[Long], 1L), (None, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Packing.zorderKey(allNull, Seq("a", "b"), bits = 4)
    }
    assert(e.getMessage.contains("no non-null values"))
  }
}
