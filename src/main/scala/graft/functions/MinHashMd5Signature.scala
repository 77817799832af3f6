package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** ORACLE-REPLAYABLE MinHash signature over STRING shingles in one
  * compiled row-local pass — the md5 sibling of [[MinHashSignature]]
  * (whose SplitMix64 family is the production default but is not
  * recomputable from SQL).
  *
  * Permutation k of shingle `sh` is the first 12 hex digits of
  * md5("$k:$sh") read as an unsigned 48-bit integer — exactly
  * `CAST(conv(substring(md5(concat(k, ':', sh)), 1, 12), 16, 10) AS
  * BIGINT)` in Spark SQL and
  * `CAST(('0x' || substring(md5(k || ':' || sh), 1, 12)) AS BIGINT)`
  * in DuckDB, so any SQL engine rebuilds the signature bit-for-bit.
  *
  * Replaces the q395 shape that derived the same family via a
  * numPerm-fold row explode and a (doc, k) shuffle-aggregate: the md5
  * work is identical (numPerm digests per shingle) but the signature
  * now falls out of the shingle scan — no exploded intermediate, no
  * shuffle, and the min-fold runs in registers instead of an
  * aggregation buffer. An empty shingle array yields Long.MaxValue
  * minima (callers filter empty docs, as the explode shape did
  * implicitly).
  */
case class MinHashMd5Signature(child: Expression, numPerm: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_md5_signature"

  // Expression trees are usually deserialized once per task, but nothing
  // in the contract forbids one instance being evaluated from two threads
  // (driver-side eval, future plan/codegen sharing) — and a shared
  // MessageDigest corrupts signatures SILENTLY. ThreadLocal costs nothing
  // next to the md5 work itself.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  // "$k:" byte prefixes, computed once per instance
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numPerm)(k => s"$k:".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val digest = md.get()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < shingles.numElements()) {
      val sh = shingles.getUTF8String(i).getBytes
      var k = 0
      while (k < numPerm) {
        digest.reset()
        digest.update(prefixes(k))
        digest.update(sh)
        val d = digest.digest()
        // first 12 hex digits = first 6 digest bytes, big-endian
        val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashMd5Signature {
  def register(spark: SparkSession, name: String, numPerm: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => MinHashMd5Signature(exprs.head, numPerm),
      "built-in"
    )
}
