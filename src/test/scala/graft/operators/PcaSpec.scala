package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** PCA fit/project semantics: an exactly-solvable planted spectrum, then
  * general eigen properties on the real embeddings fixture. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Walsh-pattern fixture: 496 rows (31 complete periods of 16), four
    * mutually-orthogonal ±1 patterns s0..s3 from the id bits, coordinates
    *   c0 = 7 + 6·s0 − 4·s1      c1 = −3 + 8·s0 + 3·s1
    *   c2 = 2 + s2               c3 = 1 + 2·s3
    * All sums are exact integer arithmetic, so the population covariance
    * is EXACTLY [[52,36,0,0],[36,73,0,0],[0,0,1,0],[0,0,0,4]] with
    * eigenpairs (100, [.6,.8,0,0]), (25, [.8,−.6,0,0]), (4, e3), (1, e2).
    */
  private lazy val planted = {
    def sgn(b: Int) =
      lit(1.0) - lit(2.0) * pmod(floor(col("id") / math.pow(2, b).toLong), lit(2))
    spark.range(496).select(col("id").as("vec_id"), array(
      (lit(7.0) + lit(6.0) * sgn(0) - lit(4.0) * sgn(1)).cast("float"),
      (lit(-3.0) + lit(8.0) * sgn(0) + lit(3.0) * sgn(1)).cast("float"),
      (lit(2.0) + sgn(2)).cast("float"),
      (lit(1.0) + lit(2.0) * sgn(3)).cast("float")).as("embedding"))
  }

  private def approx(a: Array[Double], b: Array[Double], tol: Double): Unit = {
    assert(a.length == b.length, s"${a.toSeq} vs ${b.toSeq}")
    a.indices.foreach(i =>
      assert(math.abs(a(i) - b(i)) <= tol, s"at $i: ${a.toSeq} vs ${b.toSeq}"))
  }

  test("pcaFit recovers a planted spectrum exactly (rotated 2x2 block + axes)") {
    val m = Similarity.pcaFit(planted, k = 4, vecCol = "embedding")
    approx(m.mean, Array(7.0, -3.0, 2.0, 1.0), 1e-9)
    approx(m.eigenvalues, Array(100.0, 25.0, 4.0, 1.0), 1e-9)
    approx(m.basis(0), Array(0.6, 0.8, 0.0, 0.0), 1e-9)
    approx(m.basis(1), Array(0.8, -0.6, 0.0, 0.0), 1e-9)
    approx(m.basis(2), Array(0.0, 0.0, 0.0, 1.0), 1e-9)
    approx(m.basis(3), Array(0.0, 0.0, 1.0, 0.0), 1e-9)
    approx(m.explainedVariance,
      Array(100.0 / 130, 25.0 / 130, 4.0 / 130, 1.0 / 130), 1e-12)
  }

  test("pcaReduce projections are the planted coordinates (±10, ±5, ±2)") {
    val out = Similarity.pcaReduce(planted, k = 3)
      .select(col("vec_id"),
        transform(col("proj"), x => round(x, 6)).as("proj"))
      .collect()
    assert(out.length == 496)
    out.foreach { r =>
      val id = r.getLong(0)
      val p = r.getSeq[Double](1)
      def sgn(b: Int) = 1.0 - 2.0 * ((id >> b) & 1L)
      assert(p == Seq(10.0 * sgn(0), -5.0 * sgn(1), 2.0 * sgn(3)),
        s"id=$id got $p")
    }
  }

  test("pca general properties on the embeddings fixture (orthonormal basis, eigen equation, variance match, deterministic refit)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001")("embeddings")
    val k = 8
    val m = Similarity.pcaFit(emb, k = k)
    val d = 64

    // descending spectrum, all non-negative (covariance is PSD)
    assert(m.eigenvalues.length == d)
    m.eigenvalues.sliding(2).foreach(w => assert(w(0) >= w(1) - 1e-12))
    assert(m.eigenvalues.last > -1e-9)

    // orthonormal rows
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until d).map(t => m.basis(i)(t) * m.basis(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"basis($i)·basis($j) = $dot")
    }

    // eigen equation against an independently computed covariance
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    def cov(i: Int, j: Int) =
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    val c = Array.tabulate(d, d)(cov)
    for (r <- 0 until k) {
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * m.basis(r)(j)).sum)
      approx(cv, m.basis(r).map(_ * m.eigenvalues(r)), 1e-6)
    }

    // variance of each projected coordinate equals its eigenvalue
    val proj = Similarity.pcaProject(emb, m).select("proj").collect()
      .map(_.getSeq[Double](0).toArray)
    for (r <- 0 until k) {
      val col = proj.map(_(r))
      val mu = col.sum / n
      val v = col.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - m.eigenvalues(r)) < 1e-6 * math.max(1.0, v),
        s"proj var $v vs eigenvalue ${m.eigenvalues(r)}")
    }

    // refit is byte-deterministic (sign canonicalization + stable order)
    val m2 = Similarity.pcaFit(emb, k = k)
    approx(m.mean, m2.mean, 0.0)
    approx(m.eigenvalues, m2.eigenvalues, 0.0)
    (0 until k).foreach(r => approx(m.basis(r), m2.basis(r), 0.0))

    // whitened projection: every coordinate has unit variance
    val wp = Similarity.pcaProject(emb, m, whiten = true)
      .select("proj").collect().map(_.getSeq[Double](0).toArray)
    for (r <- 0 until k) {
      val c = wp.map(_(r))
      val mu = c.sum / n
      val v = c.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - 1.0) < 1e-6, s"whitened var $v at $r")
    }
  }

  test("pcaProject maps the mean to the origin and ragged vectors are skipped in fit") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001")("embeddings")
    val m = Similarity.pcaFit(emb, k = 4)
    val meanRow = spark.range(1).select(
      typedLit(m.mean.map(_.toFloat).toSeq).as("embedding"))
    val p = Similarity.pcaProject(meanRow, m).select("proj")
      .head().getSeq[Double](0)
    p.foreach(x => assert(math.abs(x) < 1e-6))

    // a short vector must not perturb the fit
    val ragged = emb.select("embedding")
      .union(spark.range(1).select(typedLit(Seq(1.0f, 2.0f)).as("embedding")))
    val m3 = Similarity.pcaFit(ragged, k = 4, dims = 64)
    approx(m.eigenvalues, m3.eigenvalues, 0.0)
  }
}
