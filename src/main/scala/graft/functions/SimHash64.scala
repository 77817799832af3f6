package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column in one row-local pass: lowercase, split
  * on ' ' (all segments, like `split`), xxhash64 each token (seed 42 —
  * bit-identical to `xxhash64(tok)`), each hash bit votes ±1, sign of the
  * per-bit tally forms the signature.
  *
  * Replaces the explode → 64-column hash-aggregate formulation: a SimHash
  * is a per-document reduction, so computing it as an expression removes
  * the token shuffle entirely — signatures fall out of the scan, and the
  * downstream band join is the only exchange in the pipeline.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val tally = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        val h = XxHash64Function.hash(
          UTF8String.fromString(text.substring(start, i)),
          StringType,
          42L
        )
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (tally(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def register(spark: SparkSession, name: String = "simhash64"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => SimHash64(exprs.head),
      "built-in"
    )
}
