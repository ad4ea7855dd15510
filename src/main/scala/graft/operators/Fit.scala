package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model fitting for quality-classifier pipelines — the TRAINING half of the
  * [[TextOps.scoreLinear]] deployment story: fit a linear / logistic model
  * over scan-speed feature columns, ship the weights, score 100 TB in the
  * scan. (Reference ships a trained fasttext-style classifier applied
  * per-document; here both halves live in the engine.)
  *
  * Shape at scale: every pass is ONE full-scan aggregation producing the
  * O(d²) moment matrix (map-side partial combine, no shuffle of rows — the
  * reduce ships d(d+3)/2 doubles per partition); the d×d solve runs on the
  * driver, which is the right place for a ≤64×64 matrix. Nothing collects
  * rows: the only driver data is the moment matrix itself, so the same code
  * fits on 10⁴ or 10¹² rows.
  */
object Fit {

  private val MaxFeatures = 64

  /** Ordinary least squares (ridge-regularized for `ridge > 0`) via normal
    * equations in ONE distributed pass: β = (X'X + λI)⁻¹ X'y with an
    * implicit intercept column.
    *
    * @param features numeric feature columns x₁..x_d (cast to double)
    * @param label    numeric target column
    * @param ridge    L2 penalty λ on the non-intercept weights
    * @return weights `[bias, w₁, .., w_d]` in feature order — feed to
    *   [[TextOps.scoreLinear]]-style scoring as `Σ wᵢ·fᵢ + bias`
    */
  def fitLinear(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      ridge: Double = 0.0): Array[Double] = {
    require(features.nonEmpty && features.size <= MaxFeatures,
      s"need 1..$MaxFeatures features")
    val d = features.size + 1
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val y = label.cast("double")
    // upper-triangle moments of [1, x..] plus the label cross-moments —
    // a single global aggregation, partially combined map-side
    val moments =
      (for (i <- 0 until d; j <- i until d) yield sum(xs(i) * xs(j))) ++
        (0 until d).map(i => sum(xs(i) * y))
    val r = df.agg(moments.head, moments.tail: _*).head()
    val a = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = r.getDouble(k); a(j)(i) = r.getDouble(k); k += 1
    }
    val b = Array.tabulate(d)(i => r.getDouble(k + i))
    for (i <- 1 until d) a(i)(i) += ridge
    solve(a, b)
  }

  /** L2-regularized logistic regression by IRLS (Newton) — `iters`
    * distributed passes, each ONE aggregation of the weighted moment matrix
    * X'WX and gradient-adjusted response X'Wz for the current weights
    * (w = p(1−p), z = Xβ + (y−p)/w). Converges in a handful of iterations
    * on corpus-scale quality-label data; weights are broadcast to the scan
    * as literals each pass, so no shuffle ever moves a row.
    *
    * @param label 0/1 label column
    * @param ridge L2 penalty (also keeps X'WX invertible on separable data)
    * @param tol   early stop when max |Δβ| < tol
    * @return `[bias, w₁, .., w_d]` */
  def fitLogistic(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      iters: Int = 12,
      ridge: Double = 1e-6,
      tol: Double = 1e-8): Array[Double] = {
    require(features.nonEmpty && features.size <= MaxFeatures,
      s"need 1..$MaxFeatures features")
    val d = features.size + 1
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val y = label.cast("double")
    var beta = Array.fill(d)(0.0)
    var it = 0
    var done = false
    while (it < iters && !done) {
      val eta = xs.zip(beta).map { case (c, w) => c * w }.reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      // clamp the IRLS weight away from 0: saturated rows otherwise zero
      // out of the moment matrix and blow up the working response
      val w = greatest(p * (lit(1.0) - p), lit(1e-6))
      val z = eta + (y - p) / w
      val moments =
        (for (i <- 0 until d; j <- i until d) yield sum(xs(i) * xs(j) * w)) ++
          (0 until d).map(i => sum(xs(i) * z * w))
      val r = df.agg(moments.head, moments.tail: _*).head()
      val a = Array.ofDim[Double](d, d)
      var k = 0
      for (i <- 0 until d; j <- i until d) {
        a(i)(j) = r.getDouble(k); a(j)(i) = r.getDouble(k); k += 1
      }
      val b = Array.tabulate(d)(i => r.getDouble(k + i))
      for (i <- 1 until d) a(i)(i) += ridge
      val next = solve(a, b)
      done = beta.zip(next).map { case (o, n) => math.abs(o - n) }.max < tol
      beta = next
      it += 1
    }
    beta
  }

  /** [[fitLinear]] as a one-row DataFrame `(bias, w_1, .., w_d)` rounded to
    * `dp` decimals — the Verify/oracle surface (double summation order is
    * partition-dependent; rounding keeps the comparison stable). */
  def fitLinearDf(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      ridge: Double = 0.0,
      dp: Int = 4): DataFrame = {
    val beta = fitLinear(df, features, label, ridge)
    val spark = df.sparkSession
    val cols = ("bias" +: features.indices.map(i => s"w_${i + 1}")).zip(beta)
    spark.range(1).select(cols.map { case (n, v) =>
      round(lit(v), dp).as(n)
    }: _*)
  }

  /** Gaussian elimination with partial pivoting — d ≤ 65, driver-side. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    // relative pivot floor: a collinear feature makes the exact matrix
    // singular, but fp roundoff leaves a ~1e-16·scale residue — an
    // absolute epsilon would accept it and return garbage weights
    val scale = a.map(_.map(math.abs).max).max.max(java.lang.Double.MIN_NORMAL)
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n)
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      if (piv != col) {
        val t = a(col); a(col) = a(piv); a(piv) = t
        val tb = b(col); b(col) = b(piv); b(piv) = tb
      }
      require(math.abs(a(col)(col)) > 1e-12 * scale,
        "singular moment matrix — collinear or constant features")
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          for (c <- col until n) a(r)(c) -= f * a(col)(c)
          b(r) -= f * b(col)
        }
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until n) s -= a(r)(c) * x(c)
      x(r) = s / a(r)(r)
    }
    x
  }
}
