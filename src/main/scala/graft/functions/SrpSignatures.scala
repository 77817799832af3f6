package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Signed-random-projection LSH signatures: for `tables` hyperplane sets of
  * `planesPerTable` planes each, returns an `array<int>` of sign-bit
  * bucket ids for an `array<float>` embedding.
  *
  * One expression evaluating ALL tables in a tight JVM loop replaces
  * tables × planes separate `zip_with`/`aggregate` HOF columns — the HOF
  * formulation generated a giant per-row projection (48 unrolled lambda
  * loops) that dominated the ANN queries' runtime. `CodegenFallback` is
  * deliberate: the kernel is a dense float loop the JIT compiles well, and
  * keeping it out of the generated projection keeps that method small.
  */
case class SrpSignatures(
    child: Expression,
    planes: Array[Double], // [table][plane][dim] flattened
    tables: Int,
    planesPerTable: Int,
    dim: Int
) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_signatures"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    val d = math.min(dim, vec.length)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var dot = 0.0
        var i = 0
        while (i < d) {
          dot += vec(i) * planes(base + i)
          i += 1
        }
        if (dot >= 0) sig |= 1 << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSignatures {

  /** Deterministic Gaussian hyperplanes, flattened [table][plane][dim]. */
  def makePlanes(dim: Int, tables: Int, planesPerTable: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables * planesPerTable * dim)(rng.nextGaussian())
  }

  /** ORACLE-REPLAYABLE hyperplanes: component (t, p, k) is derived from
    * md5("srp|t|p|k") — first 12 hex digits as a 48-bit integer, shifted
    * and scaled to [-1, 1). Every step is exact in doubles (48-bit
    * integer → double, then a power-of-two division), so a SQL engine
    * recomputes the IDENTICAL plane family from the same strings —
    * unlike the JVM-Gaussian family above, which only the JVM can
    * produce. Sign-random-projection needs only a symmetric component
    * distribution, so uniform [-1, 1) preserves the LSH collision
    * geometry (P[collide] = 1 − θ/π per plane, as with Gaussians).
    */
  def makePlanesMd5(dim: Int, tables: Int, planesPerTable: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val half = 140737488355328L // 2^47
    val out = new Array[Double](tables * planesPerTable * dim)
    var i = 0
    for (t <- 0 until tables; p <- 0 until planesPerTable; k <- 0 until dim) {
      md.reset()
      val hex = md.digest(s"srp|$t|$p|$k".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      out(i) = (java.lang.Long.parseLong(hex, 16) - half).toDouble / half.toDouble
      i += 1
    }
    out
  }

  /** Register `<name>(vec)` over the md5-derived plane family. */
  def registerMd5(
      spark: SparkSession,
      name: String,
      dim: Int,
      tables: Int,
      planesPerTable: Int
  ): Unit = {
    val planes = makePlanesMd5(dim, tables, planesPerTable)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => SrpSignatures(exprs.head, planes, tables, planesPerTable, dim),
      "built-in"
    )
  }

  /** Register `<name>(vec)` for the given plane family; usable via
    * `expr("<name>(embedding)")`.
    */
  def register(
      spark: SparkSession,
      name: String,
      dim: Int,
      tables: Int,
      planesPerTable: Int,
      seed: Long
  ): Unit = {
    val planes = makePlanes(dim, tables, planesPerTable, seed)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => SrpSignatures(exprs.head, planes, tables, planesPerTable, dim),
      "built-in"
    )
  }
}
