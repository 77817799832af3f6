package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-replayable SimHash signature as 4 × 16-bit BAND VALUES, in one
  * compiled row-local pass — the md5 sibling of [[SimHash64]] for the
  * oracle-checked q27 path.
  *
  * Exact semantics (mirrored by the DuckDB oracle and the in-memory
  * reference in KernelParitySpec):
  *   - tokens: split on ' ', empty segments dropped (NOT lowercased —
  *     md5 is the engine-independent hash family here, and the oracle
  *     hashes the raw token);
  *   - per token, md5 of its UTF-8 bytes; `hi` = hex digits [0,8) as a
  *     32-bit value, `lo` = hex digits [8,16);
  *   - bit i of 64 votes ±1 from bit (i % 32) of (`lo` if i < 32 else
  *     `hi`); tally >= 0 → signature bit SET (ties set, matching the
  *     committed oracle);
  *   - band b ∈ [0,4) packs signature bits [16b, 16b+16) little-endian.
  *
  * Replaces an interpreted nested-HOF fold that evaluated 64 lambda
  * passes per document (31 s for 5k docs at sf0.1 — measured); this
  * expression does the same arithmetic in one JVM pass per row, so
  * signatures fall out of the scan and the band-bucket join is the
  * pipeline's only exchange.
  */
case class SimHashMd5Bands(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_md5_bands"

  // Expression trees are usually deserialized once per task, but nothing
  // forbids one instance being evaluated from two threads (driver-side
  // eval, plan sharing) — and a shared MessageDigest corrupts bands
  // SILENTLY. ThreadLocal costs nothing next to the md5 work itself.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val digest = md.get()
    val tally = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) {
          digest.reset()
          val d = digest.digest(text.substring(start, i).getBytes("UTF-8"))
          val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          var j = 0
          while (j < 64) {
            val half = if (j < 32) lo else hi
            if (((half >>> (j % 32)) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        if (tally(b * 16 + j) >= 0) v |= (1L << j)
        j += 1
      }
      bands(b) = v
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashMd5Bands {
  def register(spark: SparkSession, name: String = "simhash_md5_bands"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => SimHashMd5Bands(exprs.head),
      "built-in"
    )
}
