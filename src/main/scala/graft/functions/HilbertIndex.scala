package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert curve index `xy2d` (Hamilton's bit transform): maps a 2-D
  * grid cell in [0,2^bits)² to its position on the space-filling curve
  * in [0,4^bits) — consecutive positions are always grid-adjacent, the
  * locality property Z-order lacks at power-of-two seams.
  *
  * A native Catalyst `Expression` with `doGenCode` (preference order
  * (b)): the per-level rotate/reflect recurrence is a LOOP, which as a
  * pure Column expression would unroll into an exponentially-duplicated
  * tree (the bits=8 unrolled form OOMed the analyzer); generated code
  * runs it in constant space inside whole-stage codegen.
  */
case class HilbertIndex(x: Expression, y: Expression, b: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = b

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (x.dataType == LongType && y.dataType == LongType && b.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index(bigint, bigint, int), got (${x.dataType.catalogString}, " +
          s"${y.dataType.catalogString}, ${b.dataType.catalogString})")

  override def nullSafeEval(xv: Any, yv: Any, bv: Any): Any = {
    var cx = xv.asInstanceOf[Long]
    var cy = yv.asInstanceOf[Long]
    val bits = bv.asInstanceOf[Int]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((cx & s) > 0) 1L else 0L
      val ry = if ((cy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { cx = s - 1 - cx; cy = s - 1 - cy }
        val t = cx; cx = cy; cy = t
      }
      s >>= 1
    }
    java.lang.Long.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv, bv) => {
      val cx = ctx.freshName("hx")
      val cy = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $cx = $xv;
         |long $cy = $yv;
         |long $d = 0L;
         |for (long $s = 1L << ($bv - 1); $s > 0; $s >>= 1) {
         |  long $rx = (($cx & $s) > 0) ? 1L : 0L;
         |  long $ry = (($cy & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $cx = $s - 1 - $cx; $cy = $s - 1 - $cy; }
         |    long $t = $cx; $cx = $cy; $cy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(x = newFirst, y = newSecond, b = newThird)
}

object HilbertIndex {

  /** Register `hilbert_index(x, y, bits)` as a session SQL function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index",
      exprs => HilbertIndex(exprs(0), exprs(1), exprs(2)),
      "built-in"
    )
}
