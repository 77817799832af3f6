package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numPerm` MinHash permutation minima of a hashed-shingle set
  * (`array<long>`) in ONE pass — a MinHash signature is row-local, so
  * computing it as an expression removes the explode → 64-column
  * min-aggregate → regroup shuffle entirely: signatures fall out of the
  * same scan that produced the shingles.
  *
  * Permutation p of shingle hash h is `mix64(h ^ seed(p))` with SplitMix64
  * finalization per-permutation seeds — an avalanche-quality 64-bit
  * bijection, ANSI-safe (JVM arithmetic wraps; Catalyst arithmetic would
  * trap under ANSI mode, which is why this lives in an expression and not
  * in column math).
  */
case class MinHashSignature(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val permSeeds: Array[Long] = {
    var s = seed
    Array.fill(numPerm) {
      // SplitMix64 stream over the base seed.
      s += 0x9e3779b97f4a7c15L
      MinHashSignature.mix64(s)
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData].toLongArray()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      var p = 0
      while (p < numPerm) {
        val v = MinHashSignature.mix64(h ^ permSeeds(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** SplitMix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def register(spark: SparkSession, name: String, numPerm: Int, seed: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => MinHashSignature(exprs.head, numPerm, seed),
      "built-in"
    )
}
