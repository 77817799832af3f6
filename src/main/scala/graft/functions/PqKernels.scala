package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou/Douze/Schmid, TPAMI'11) — the
  * memory-bound scale path of the ANN family: each `dim`-dimensional
  * vector is split into `m` subvectors quantized independently against a
  * `ksub`-entry codebook, so a 64-float embedding compresses to `m` small
  * codes, and query scoring against a candidate costs `m` TABLE LOOKUPS
  * instead of `dim` multiplies (asymmetric distance computation, ADC).
  *
  * All three kernels are row-local expressions with the codebook matrix
  * baked into the plan (like [[NearestCentroids]] — the model is tiny,
  * the data is the distributed part):
  *
  *   - [[PqEncode]]  : embedding → `array<int>` of m codes (index build —
  *     at 100 TB this is the column you persist; 8 bytes/vector instead
  *     of 256);
  *   - [[PqLut]]     : query → flattened m×ksub dot-product lookup table,
  *     with the query norm appended (computed ONCE per query, the whole
  *     point of ADC);
  *   - [[PqAdcCosine]]: (codes, lut) → approximate cosine in m adds via
  *     the lut plus the static per-code reconstruction-norm table.
  *
  * approx_cos(q, x) = Σ_s <q_s, c_{s,code_s}> / (‖q‖ · ‖x̂‖), where
  * x̂ = concat of chosen centroids and ‖x̂‖² = Σ_s ‖c_{s,code_s}‖² is
  * code-only — so the scan never touches the original embedding.
  */
case class PqEncode(
    child: Expression,
    codebooks: Array[Double], // [m][ksub][dsub] flattened
    m: Int,
    ksub: Int,
    dim: Int
) extends UnaryExpression
    with CodegenFallback {

  private val dsub = dim / m

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = s * dsub + i
          val v = if (x < vec.length) vec(x).toDouble else 0.0
          val diff = v - codebooks(base + i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqLut(
    child: Expression,
    codebooks: Array[Double],
    m: Int,
    ksub: Int,
    dim: Int
) extends UnaryExpression
    with CodegenFallback {

  private val dsub = dim / m

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    val lut = new Array[Double](m * ksub + 1)
    var qq = 0.0
    var x = 0
    while (x < math.min(dim, vec.length)) { qq += vec(x).toDouble * vec(x); x += 1 }
    lut(m * ksub) = math.sqrt(qq)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val xi = s * dsub + i
          val v = if (xi < vec.length) vec(xi).toDouble else 0.0
          dot += v * codebooks(base + i)
          i += 1
        }
        lut(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcCosine(
    left: Expression, // codes array<int>
    right: Expression, // lut array<double> (m*ksub + 1, last = ||q||)
    codeNorms2: Array[Double], // [m][ksub] flattened ‖centroid‖²
    m: Int,
    ksub: Int
) extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData].toIntArray()
    val lut = lutAny.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0
    var n2 = 0.0
    var s = 0
    while (s < m) {
      val c = codes(s)
      dot += lut(s * ksub + c)
      n2 += codeNorms2(s * ksub + c)
      s += 1
    }
    val qn = lut(m * ksub)
    val denom = qn * math.sqrt(n2)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqKernels {

  /** ‖c_{s,code}‖² table from the flattened codebook matrix. */
  def codeNorms2(codebooks: Array[Double], m: Int, ksub: Int, dsub: Int): Array[Double] = {
    val out = new Array[Double](m * ksub)
    var sc = 0
    while (sc < m * ksub) {
      var ss = 0.0
      var i = 0
      while (i < dsub) { ss += codebooks(sc * dsub + i) * codebooks(sc * dsub + i); i += 1 }
      out(sc) = ss
      sc += 1
    }
    out
  }

  def register(
      spark: SparkSession,
      prefix: String,
      codebooks: Array[Double],
      m: Int,
      ksub: Int,
      dim: Int
  ): Unit = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      s"${prefix}_encode",
      exprs => PqEncode(exprs.head, codebooks, m, ksub, dim),
      "built-in")
    reg.createOrReplaceTempFunction(
      s"${prefix}_lut",
      exprs => PqLut(exprs.head, codebooks, m, ksub, dim),
      "built-in")
    val norms = codeNorms2(codebooks, m, ksub, dim / m)
    reg.createOrReplaceTempFunction(
      s"${prefix}_adc",
      exprs => PqAdcCosine(exprs.head, exprs(1), norms, m, ksub),
      "built-in")
  }
}
