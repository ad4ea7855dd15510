package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** One-pass compute kernels for the embedding-similarity operators
  * (`graft.operators.Similarity`), exposed as Catalyst `StaticInvoke`
  * expressions — the same codegen-friendly idiom as [[TextKernels]].
  *
  * Why: the `aggregate(zip_with(...))` higher-order-function formulation
  * evaluates an interpreted lambda per array element per row; the LSH
  * signature additionally repeats that fold once per hyperplane (16× per
  * row). At 100 TB that interpreted inner loop IS the scan cost. A
  * `StaticInvoke` of a static JVM method stays inside whole-stage codegen
  * (non-virtual call, no UDF ser/de) and walks the vector bytes once.
  *
  * Numeric parity: every kernel accumulates `left-to-right` in double —
  * identical operation order to the `aggregate` fold it replaces and to
  * the DuckDB oracle's `list_inner_product(a::DOUBLE[], b::DOUBLE[])`, so
  * results are bit-identical and the oracle hash-match is preserved.
  * Vectors are `array<float>` (embeddings), hyperplanes/centroids are
  * double literals baked in at plan time.
  */
object VectorKernels {

  private def inv(ret: DataType, method: String, args: Seq[org.apache.spark.sql.catalyst.expressions.Expression], in: Seq[DataType]): Column =
    GraftColumnBridge.column(StaticInvoke(
      VectorKernels.getClass, ret, method, args, in, returnNullable = false))

  private val floatArr = ArrayType(FloatType)
  private val doubleArr = ArrayType(DoubleType, containsNull = false)

  private def flatLit(planes: Array[Array[Double]]): Literal =
    Literal.create(new GenericArrayData(planes.flatten), doubleArr)

  // ------------------------------------------------------------- cosine

  /** cos(a, b) over two float vectors, one pass (Σab, Σaa, Σbb together). */
  def cosineCol(a: Column, b: Column): Column =
    inv(DoubleType, "cosineFF",
      Seq(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)),
      Seq(floatArr, floatArr))

  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  /** Σ aᵢbᵢ over two float vectors. */
  def dotCol(a: Column, b: Column): Column =
    inv(DoubleType, "dotFF",
      Seq(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)),
      Seq(floatArr, floatArr))

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  // ----------------------------------------- normalization / quantization

  /** L2-normalize a float vector → array<double> rounded to 6 digits (the
    * repo-wide fp-parity convention with the DuckDB oracle — see
    * `Dedup.minHashPairs` jaccard). Zero vectors pass through as zeros. */
  def l2NormalizeCol(vec: Column): Column =
    inv(doubleArr, "l2Normalize",
      Seq(GraftColumnBridge.expression(vec)), Seq(floatArr))

  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      out(i) = if (norm == 0.0) 0.0
        else java.math.BigDecimal.valueOf(x / norm)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric int8 scalar quantization: scale = 127 / max|xᵢ|, qᵢ =
    * round(xᵢ·scale) half-away-from-zero (the rounding DuckDB's `round`
    * uses, so the oracle replays it exactly). The all-zero vector
    * quantizes to zeros. ~4× less shuffle/storage bytes per embedding —
    * the cheap first step before IVF/LSH indexing at corpus scale. */
  def quantizeInt8Col(vec: Column): Column =
    inv(ArrayType(IntegerType, containsNull = false), "quantizeInt8",
      Seq(GraftColumnBridge.expression(vec)), Seq(floatArr))

  def quantizeInt8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble * scale
      out(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------- random-hyperplane LSH

  /** Sign-bit signature of `vec` against `planes` hyperplanes → long;
    * bit i = (vec · planeᵢ >= 0). All planes in one pass over the vector
    * (replaces one interpreted fold per plane). */
  def lshSignatureCol(vec: Column, planes: Array[Array[Double]]): Column =
    inv(LongType, "lshSignature",
      Seq(GraftColumnBridge.expression(vec), flatLit(planes),
        Literal(planes.length)),
      Seq(floatArr, doubleArr, IntegerType))

  def lshSignature(vec: ArrayData, flat: ArrayData, planesN: Int): Long = {
    val dims = flat.numElements() / planesN
    var sig = 0L
    var p = 0
    while (p < planesN) {
      var s = 0.0
      val off = p * dims
      var i = 0
      while (i < dims) { s += vec.getFloat(i).toDouble * flat.getDouble(off + i); i += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  // --------------------------------------------------- IVF cell routing

  /** Cell whose centroid direction has the max dot with `vec`; ties break
    * to the larger cell id (matches `sort_array(..., asc=false)(0)` on
    * `struct(d, cell)` — descending lexicographic). */
  def argmaxCellCol(vec: Column, cents: Array[Array[Double]]): Column =
    inv(IntegerType, "argmaxCell",
      Seq(GraftColumnBridge.expression(vec), flatLit(cents),
        Literal(cents.length)),
      Seq(floatArr, doubleArr, IntegerType))

  def argmaxCell(vec: ArrayData, flat: ArrayData, nlist: Int): Int = {
    val dims = flat.numElements() / nlist
    var best = Double.NegativeInfinity
    var bestCell = -1
    var c = 0
    while (c < nlist) {
      var s = 0.0
      val off = c * dims
      var i = 0
      while (i < dims) { s += vec.getFloat(i).toDouble * flat.getDouble(off + i); i += 1 }
      if (s >= best) { best = s; bestCell = c } // >= : later cell wins ties
      c += 1
    }
    bestCell
  }

  /** The `nprobe` cells with the largest centroid dots, descending (same
    * order/tie rule as the sorted-struct formulation). */
  def topCellsCol(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    inv(ArrayType(IntegerType, containsNull = false), "topCells",
      Seq(GraftColumnBridge.expression(vec), flatLit(cents),
        Literal(cents.length), Literal(nprobe)),
      Seq(floatArr, doubleArr, IntegerType, IntegerType))

  def topCells(vec: ArrayData, flat: ArrayData, nlist: Int, nprobe: Int): ArrayData = {
    val dims = flat.numElements() / nlist
    val dots = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0
      val off = c * dims
      var i = 0
      while (i < dims) { s += vec.getFloat(i).toDouble * flat.getDouble(off + i); i += 1 }
      dots(c) = s
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var j = 0
    while (j < k) {
      var best = Double.NegativeInfinity
      var bestCell = -1
      var cc = 0
      while (cc < nlist) {
        if (!taken(cc) && (dots(cc) >= best)) { best = dots(cc); bestCell = cc }
        cc += 1
      }
      taken(bestCell) = true
      out(j) = bestCell
      j += 1
    }
    new GenericArrayData(out)
  }

  // --------------------------------------------------- random projection

  /** `k` dot products against plan-time direction literals, optionally
    * L2-re-normalized — one pass, left-to-right accumulation for oracle
    * parity with `list_inner_product`. */
  def projectCol(vec: Column, planes: Array[Array[Double]],
      normalize: Boolean): Column =
    inv(doubleArr, "project",
      Seq(GraftColumnBridge.expression(vec), flatLit(planes),
        Literal(planes.length), Literal(normalize)),
      Seq(floatArr, doubleArr, IntegerType, BooleanType))

  def project(vec: ArrayData, flat: ArrayData, k: Int,
      normalize: Boolean): ArrayData = {
    val d = vec.numElements()
    val out = new Array[Double](k)
    var i = 0
    while (i < k) {
      var s = 0.0
      var j = 0
      while (j < d) {
        s += vec.getFloat(j).toDouble * flat.getDouble(i * d + j); j += 1
      }
      out(i) = s; i += 1
    }
    if (normalize) {
      var n2 = 0.0
      var a = 0
      while (a < k) { n2 += out(a) * out(a); a += 1 }
      val nrm = math.sqrt(n2)
      if (nrm != 0.0) {
        var b = 0
        while (b < k) { out(b) /= nrm; b += 1 }
      }
    }
    new GenericArrayData(out)
  }

  /** `k` dot products against plan-time direction literals, each shifted
    * by a per-direction constant — the mean-centered linear projection
    * `W·x − W·μ` a PCA reduce applies at scan speed (the centering folds
    * into one precomputed offset per output coordinate, so the vector is
    * never copied). Left-to-right accumulation for oracle parity. */
  def projectOffsetCol(vec: Column, planes: Array[Array[Double]],
      offsets: Array[Double]): Column =
    inv(doubleArr, "projectOffset",
      Seq(GraftColumnBridge.expression(vec), flatLit(planes),
        Literal.create(new GenericArrayData(offsets), doubleArr),
        Literal(planes.length)),
      Seq(floatArr, doubleArr, doubleArr, IntegerType))

  def projectOffset(vec: ArrayData, flat: ArrayData, offs: ArrayData,
      k: Int): ArrayData = {
    val d = vec.numElements()
    val out = new Array[Double](k)
    var i = 0
    while (i < k) {
      var s = 0.0
      var j = 0
      while (j < d) {
        s += vec.getFloat(j).toDouble * flat.getDouble(i * d + j); j += 1
      }
      out(i) = s - offs.getDouble(i); i += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------------- product quantization

  private def booksLit(books: Array[Array[Array[Double]]]): Literal =
    Literal.create(new GenericArrayData(books.flatten.flatten), doubleArr)

  /** PQ codes: the vector splits into `books.length` equal subspaces and
    * each sub-vector takes the index of its nearest (squared-L2)
    * sub-centroid — ties to the LOWER code (strict `<`, matching an
    * oracle's `ORDER BY dist ASC, code ASC` replay). Codebooks are baked
    * flat at plan time: [sub][code][subdim]. */
  def pqEncodeCol(vec: Column, books: Array[Array[Array[Double]]]): Column =
    inv(ArrayType(IntegerType, containsNull = false), "pqEncode",
      Seq(GraftColumnBridge.expression(vec), booksLit(books),
        Literal(books.length), Literal(books(0).length)),
      Seq(floatArr, doubleArr, IntegerType, IntegerType))

  def pqEncode(vec: ArrayData, flat: ArrayData, m: Int, ksub: Int): ArrayData = {
    val subdim = vec.numElements() / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestC = -1
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * subdim
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val diff = vec.getFloat(s * subdim + i).toDouble - flat.getDouble(off + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC; s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: fixed-point micro-units
    * `floor(dot(q_sub, c[sub][code]) · 1e6 + 0.5)` for every (sub, code) —
    * computed ONCE per query row, so scoring a candidate is m integer
    * lookups instead of a dims-wide float dot. Integer entries make the
    * downstream sum order-independent and exactly replayable by any ANSI
    * engine (`floor(x·1e6 + 0.5)` ≡ JVM `Math.round`). */
  def pqLutCol(qvec: Column, books: Array[Array[Array[Double]]]): Column =
    inv(ArrayType(LongType, containsNull = false), "pqLut",
      Seq(GraftColumnBridge.expression(qvec), booksLit(books),
        Literal(books.length), Literal(books(0).length)),
      Seq(floatArr, doubleArr, IntegerType, IntegerType))

  def pqLut(q: ArrayData, flat: ArrayData, m: Int, ksub: Int): ArrayData = {
    val subdim = q.numElements() / m
    val out = new Array[Long](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * subdim
        var d = 0.0
        var i = 0
        while (i < subdim) {
          d += q.getFloat(s * subdim + i).toDouble * flat.getDouble(off + i)
          i += 1
        }
        out(s * ksub + c) = math.round(d * 1e6)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score of one candidate: Σ_sub lut[sub·ksub + code_sub] — the
    * m-lookup inner loop of a PQ scan. */
  def pqLookupCol(lut: Column, codes: Column, ksub: Int): Column =
    inv(LongType, "pqLookup",
      Seq(GraftColumnBridge.expression(lut), GraftColumnBridge.expression(codes),
        Literal(ksub)),
      Seq(ArrayType(LongType), ArrayType(IntegerType), IntegerType))

  def pqLookup(lut: ArrayData, codes: ArrayData, ksub: Int): Long = {
    var acc = 0L
    var s = 0
    val m = codes.numElements()
    while (s < m) { acc += lut.getLong(s * ksub + codes.getInt(s)); s += 1 }
    acc
  }
}
