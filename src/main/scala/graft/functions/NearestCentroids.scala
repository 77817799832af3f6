package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nprobe` nearest coarse centroids (by cosine) of an `array<float>`
  * embedding, as an `array<int>` of centroid ids, best first — the
  * assignment/probe kernel of the IVF ANN index.
  *
  * The centroid matrix is baked into the expression (driver-side model,
  * broadcast with the serialized plan — standard IVF: the coarse
  * quantizer is tiny, the inverted lists are the distributed part). One
  * tight JVM loop per row: k×dim multiply-adds, a running top-nprobe
  * insertion — no join, no shuffle, no per-row allocation beyond the
  * output. `CodegenFallback` keeps the dense loop out of the generated
  * projection; the JIT compiles it well.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Double], // [centroid][dim] flattened, L2-normalized
    k: Int,
    dim: Int,
    nprobe: Int
) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    val d = math.min(dim, vec.length)
    val n = math.min(nprobe, k)
    // Running top-n by dot product against normalized centroids (cosine
    // order — the query vector's own norm is constant across centroids).
    val bestIds = new Array[Int](n)
    val bestDots = Array.fill(n)(Double.NegativeInfinity)
    var c = 0
    while (c < k) {
      val base = c * dim
      var dot = 0.0
      var i = 0
      while (i < d) {
        dot += vec(i) * centroids(base + i)
        i += 1
      }
      if (dot > bestDots(n - 1)) {
        var j = n - 1
        while (j > 0 && bestDots(j - 1) < dot) {
          bestDots(j) = bestDots(j - 1); bestIds(j) = bestIds(j - 1); j -= 1
        }
        bestDots(j) = dot
        bestIds(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestIds)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** L2-normalize a [k][dim] centroid matrix in place-flattened form so
    * dot products order like cosine.
    */
  def normalize(flat: Array[Double], k: Int, dim: Int): Array[Double] = {
    val out = flat.clone()
    var c = 0
    while (c < k) {
      val base = c * dim
      var ss = 0.0
      var i = 0
      while (i < dim) { ss += out(base + i) * out(base + i); i += 1 }
      val nrm = math.sqrt(ss)
      if (nrm > 0) {
        i = 0
        while (i < dim) { out(base + i) /= nrm; i += 1 }
      }
      c += 1
    }
    out
  }

  def register(
      spark: SparkSession,
      name: String,
      centroids: Array[Double],
      k: Int,
      dim: Int,
      nprobe: Int
  ): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => NearestCentroids(exprs.head, normalize(centroids, k, dim), k, dim, nprobe),
      "built-in"
    )
}
