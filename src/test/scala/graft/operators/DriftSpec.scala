package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** PSI distribution-drift semantics. */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val li = Tables.load(spark, "/root/testdata/sf0.001")("lineitem")

  test("psiReport: identical snapshots score exactly zero, detail shape is cols x buckets") {
    val d = Profile.psiReport(li, li,
      Seq("l_quantity", "l_extendedprice"), buckets = 8, exact = true).cache()
    assert(d.count() == 16)
    // p == q per bucket → every term (q-p)·ln(q/p) is exactly 0
    assert(d.where(col("psi_term") =!= 0.0).count() == 0)
    val s = Profile.psiSummary(d).collect()
    assert(s.length == 2)
    s.foreach(r => assert(r.getDouble(1) == 0.0))
    // census accounting: per-column counts sum to the snapshot row count
    val n = li.count()
    s.foreach(r => assert(r.getLong(2) == n && r.getLong(3) == n))
  }

  test("psiReport: a planted location shift dominates an undrifted column") {
    val ref = li.select(col("l_quantity"), col("l_discount"))
    val cur = li.select((col("l_quantity") + 30.0).as("l_quantity"),
      col("l_discount"))
    val s = Profile.psiSummary(
      Profile.psiReport(ref, cur, Seq("l_quantity", "l_discount"),
        exact = true))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("l_quantity") > 0.25, s"shifted psi ${s("l_quantity")}")
    assert(s("l_discount") < 0.05, s"stable psi ${s("l_discount")}")
  }

  test("psiReport: NULLs drop out of census and totals; approx mode tracks exact") {
    val ref = li.select(
      when(col("l_linenumber") === 1, col("l_quantity")).as("q"))
    val cur = li.select(col("l_quantity").as("q"))
    val d = Profile.psiReport(ref, cur, Seq("q"), exact = true)
    val nonNull = ref.where(col("q").isNotNull).count()
    val s = Profile.psiSummary(d).head()
    assert(s.getLong(2) == nonNull)
    assert(s.getLong(3) == li.count())

    val ex = Profile.psiSummary(Profile.psiReport(li, li.limit(3000),
      Seq("l_extendedprice"), exact = true)).head().getDouble(1)
    val ap = Profile.psiSummary(Profile.psiReport(li, li.limit(3000),
      Seq("l_extendedprice"))).head().getDouble(1)
    assert(math.abs(ex - ap) < 0.05, s"exact $ex vs approx $ap")
  }

  test("clipOutliers: bounds respected, interior untouched, nulls and types preserved") {
    val clipped = Profile.clipOutliers(li,
      Seq("l_extendedprice"), lo = 0.1, hi = 0.9, exact = true).cache()
    val Seq(qlo, qhi) = li
      .select(percentile(col("l_extendedprice"), array(lit(0.1), lit(0.9))))
      .head().getSeq[Double](0).toSeq
    val lo6 = BigDecimal(qlo).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hi6 = BigDecimal(qhi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(clipped.where(col("l_extendedprice") < lo6 ||
      col("l_extendedprice") > hi6).count() == 0)
    // interior values pass through bit-identically: the clipped frame's
    // strictly-inside values are exactly the original inside multiset
    // ((l_orderkey, l_linenumber) is not unique in this fixture, so a
    // key join cannot pair rows — compare value multisets instead)
    val origVals = li.where(col("l_extendedprice") > lo6 &&
        col("l_extendedprice") < hi6)
      .select("l_extendedprice").as[Double].collect().sorted.toSeq
    val clVals = clipped.where(col("l_extendedprice") > lo6 &&
        col("l_extendedprice") < hi6)
      .select("l_extendedprice").as[Double].collect().sorted.toSeq
    assert(origVals == clVals)
    // an int column keeps its type; nulls stay null
    val d = Seq((Some(1), 1L), (Some(100), 2L), (None, 3L),
      (Some(2), 4L), (Some(3), 5L)).toDF("v", "id")
    val c = Profile.clipOutliers(d, Seq("v"), lo = 0.0, hi = 0.5, exact = true)
    assert(c.schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(c.where(col("id") === 3 && col("v").isNull).count() == 1)
    assert(c.agg(max("v")).head().getInt(0) <= 3)
  }

  test("asof forward matches a local next-event reference, tolerance nulls far matches") {
    import graft.Tables
    val ev = Tables.load(spark, "/root/testdata/sf0.001")("events")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    val got = Joins.asof(clicks, purch, Seq("user_id"),
        valueCols = Seq("pv"), direction = "forward")
      .select("event_id", "pv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // local reference: earliest purchase with p.ts >= c.ts per user
    val ps = purch.collect().map(r => (r.getLong(0),
      r.getTimestamp(1).getTime, r.getDouble(2)))
    val ref = clicks.collect().map { r =>
      val (u, t) = (r.getLong(1), r.getTimestamp(2).getTime)
      val cand = ps.filter(p => p._1 == u && p._2 >= t)
      r.getLong(0) -> (if (cand.isEmpty) None
                       else Some(cand.minBy(p => (p._2, p._3))._3))
    }.toMap
    // min ties by (ts): if two purchases share a user+ts, match the
    // window's pick only when values agree — skip ambiguous keys
    ref.foreach { case (id, exp) =>
      val ambiguous = exp.isDefined && {
        val r = clicks.where(col("event_id") === id).head()
        val t = r.getTimestamp(2).getTime
        val u = r.getLong(1)
        val firstTs = ps.filter(p => p._1 == u && p._2 >= t).map(_._2).min
        ps.count(p => p._1 == u && p._2 == firstTs) > 1
      }
      if (!ambiguous) assert(got(id) == exp, s"event $id")
    }
    // forward tolerance: zero-second horizon keeps only same-ts matches
    val tight = Joins.asof(clicks, purch, Seq("user_id"),
      valueCols = Seq("pv"), direction = "forward", toleranceSec = 0.001)
    assert(tight.where(col("pv").isNotNull).count() <=
      got.count(_._2.isDefined))
  }

  test("psiStream scores each micro-batch against the fixed reference, batch-operator parity") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = li.select("l_quantity", "l_discount")
    val model = Profile.psiFit(ref, Seq("l_quantity", "l_discount"),
      buckets = 8, exact = true)
    // batch 1: undrifted slice; batch 2: planted +30 location shift
    val b1 = li.limit(1000).select("l_quantity", "l_discount")
      .as[(Double, Double)].collect().toSeq
    val b2 = b1.map { case (q, d) => (q + 30.0, d) }
    val mem = MemoryStream[(Double, Double)]
    val src = mem.toDF().toDF("l_quantity", "l_discount")
    val got = scala.collection.mutable.Map[Long, Array[org.apache.spark.sql.Row]]()
    val q = graft.streaming.DriftMonitor.psiStream(src, model) { (df, id) =>
      got(id) = Profile.psiSummary(df).orderBy("col_name").collect()
    }.start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    graft.SparkTestBase.stopQuietly(q)
    // parity with the batch operator on each micro-batch
    def exp(rows: Seq[(Double, Double)]) =
      Profile.psiSummary(Profile.psiAgainst(
        rows.toDF("l_quantity", "l_discount"), model))
        .orderBy("col_name").collect()
    assert(got(0L).toSeq == exp(b1).toSeq)
    assert(got(1L).toSeq == exp(b2).toSeq)
    // and the drifted batch's quantity PSI screams while discount stays low
    val s2 = got(1L).map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s2("l_quantity") > 0.25 && s2("l_discount") < 0.05, s2.toString)
  }

  test("asof tieBreak: duplicate right (key, ts) rows resolve deterministically") {
    // two purchases share (user 1, ts 100) — without a tiebreak the
    // match is whichever shuffled row landed last; with tieBreak the
    // HIGHEST seq wins, in both directions
    val left = Seq((1L, 100L), (1L, 150L)).toDF("user_id", "ts")
    val right = Seq((1L, 100L, 10.0, 1L), (1L, 100L, 20.0, 2L),
        (1L, 100L, 15.0, 0L))
      .toDF("user_id", "ts", "pv", "seq")
    for (dir <- Seq("backward", "forward")) {
      val expectRows = dir match {
        case "backward" => Map(100L -> 20.0, 150L -> 20.0)
        case _          => Map(100L -> 20.0, 150L -> Double.NaN)
      }
      (1 to 3).foreach { _ =>
        val got = Joins.asof(left, right.repartition(8), Seq("user_id"),
            valueCols = Seq("pv", "seq"), direction = dir,
            tieBreak = Some("seq"))
          .select("ts", "pv").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
        expectRows.foreach { case (ts, pv) =>
          if (pv.isNaN) assert(got(ts).isNaN, s"$dir ts=$ts")
          else assert(got(ts) == pv, s"$dir ts=$ts got ${got(ts)}")
        }
      }
    }
    // a tieBreak column outside valueCols is a loud error, not a silent
    // nondeterministic run
    intercept[IllegalArgumentException] {
      Joins.asof(left, right, Seq("user_id"), valueCols = Seq("pv"),
        tieBreak = Some("seq")).collect()
    }
  }

  test("clipOutliers: integral and decimal columns clamp inside the quantile range") {
    // int column, p10/p90 land at fractional interpolated values —
    // the clamp bounds must snap INWARD (ceil lo, floor hi) so the
    // int cast cannot truncate a clamped value below lo or above hi
    val d = (Seq.fill(8)(5) ++ Seq(-100, 1000)).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val c = Profile.clipOutliers(d, Seq("v"), lo = 0.05, hi = 0.95,
      exact = true).cache()
    val Seq(qlo, qhi) = d.select(
      percentile(col("v").cast("double"), array(lit(0.05), lit(0.95))))
      .head().getSeq[Double](0).toSeq
    assert(c.schema("v").dataType == org.apache.spark.sql.types.IntegerType)
    val vals = c.select("v").as[Int].collect()
    vals.foreach(v => assert(v >= qlo && v <= qhi,
      s"$v outside [$qlo, $qhi]"))
    // decimal(4,1): bounds snap to one decimal place, inward
    val dd = (Seq.fill(8)(BigDecimal("5.0")) ++
        Seq(BigDecimal("-99.9"), BigDecimal("99.9"))).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
      .select(col("v").cast("decimal(4,1)").as("v"), col("id"))
    val cd = Profile.clipOutliers(dd, Seq("v"), lo = 0.05, hi = 0.95,
      exact = true)
    val Seq(dlo, dhi) = dd.select(
      percentile(col("v").cast("double"), array(lit(0.05), lit(0.95))))
      .head().getSeq[Double](0).toSeq
    cd.select(col("v").cast("double")).as[Double].collect()
      .foreach(v => assert(v >= dlo && v <= dhi, s"$v outside [$dlo, $dhi]"))
  }

  test("ExactQuantiles == builtin percentile bit-for-bit (global, grouped, edges)") {
    // the r14 optimization replaced the exact-mode builtin `percentile`
    // (OpenHashMap ImperativeAggregate) with the primitive-buffer typed
    // aggregator in psiFit/clipOutliers/quantilesBy/scoreBuckets; this
    // pins the replacement to the builtin's exact double arithmetic
    val fracs = Array(0.0, 0.05, 1.0 / 3, 0.5, 0.9, 0.95, 1.0)
    val agg = udaf(new Profile.ExactQuantiles(fracs))
    val arr = array(fracs.map(lit).toIndexedSeq: _*)

    // real data with heavy duplicates + near-unique doubles
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount")) {
      val Seq(mine, ref) = li.agg(
        agg(col(c).cast("double")),
        percentile(col(c).cast("double"), arr)
      ).head().toSeq.map(_.asInstanceOf[scala.collection.Seq[Double]])
      assert(mine == ref, s"$c: $mine != $ref")
    }

    // grouped: per-group buffers, including a single-row group
    val g = li.groupBy(col("l_returnflag"))
      .agg(agg(col("l_quantity").cast("double")).as("m"),
        percentile(col("l_quantity").cast("double"), arr).as("r"))
      .collect()
    assert(g.nonEmpty)
    g.foreach(r => assert(r.getSeq[Double](1) == r.getSeq[Double](2), r))

    // edge rows: negatives, -0.0/0.0, nulls interleaved, single value
    val edge = Seq[java.lang.Double](-5.0, -0.0, 0.0, null, 7.25, 7.25, null, 1e-300)
      .toDF("v")
    val Seq(em, er) = edge.agg(agg(col("v")), percentile(col("v"), arr))
      .head().toSeq.map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(em == er, s"$em != $er")

    // all-null column → null, matching the builtin (callers branch on it)
    val allNull = Seq[java.lang.Double](null, null).toDF("v")
    val rn = allNull.agg(agg(col("v")), percentile(col("v"), arr)).head()
    assert(rn.isNullAt(0) && rn.isNullAt(1), rn)
  }
}
