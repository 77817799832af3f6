package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin–Karp style) over a string's UTF-8 bytes:
  * `h = h * base + byte`, 64-bit wrapping — the standard document
  * fingerprint primitive.
  *
  * A native Catalyst `Expression` with `doGenCode` (preference order (b) of
  * the build rules): the generated loop lives inside whole-stage codegen,
  * no UDF boxing, no UTF8String→String copy. `nullSafeEval` is the
  * interpreted fallback for non-codegen paths.
  */
case class RollingHash64(child: Expression, base: Long) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires a string argument, got ${child.dataType.catalogString}"
      )
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * base + (bytes(i) & 0xff)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = $h * ${base}L + ($b[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {
  val DefaultBase: Long = 1000003L

  /** Register `rolling_hash64(str)` as a session SQL function, usable via
    * `expr("rolling_hash64(text)")` — avoids any Column↔Expression bridge.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64",
      exprs => RollingHash64(exprs.head, DefaultBase),
      "built-in"
    )
}
