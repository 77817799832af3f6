package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric array columns in one compiled pass —
  * semantically identical to
  * `VectorOps.cosine(VectorOps.toDouble(a), VectorOps.toDouble(b))` and
  * bit-identical in result: each element is cast to double then folded
  * left-to-right exactly like the `zip_with`/`aggregate` formulation (and
  * the DuckDB oracle's list comprehension), so `round(..., 6)` parity holds.
  *
  * Exists because Spark's higher-order functions are interpreted
  * (`HigherOrderFunction` has no codegen): the HOF version allocates three
  * intermediate arrays and evaluates ~4·dim lambda trees per pair, which
  * dominated candidate verification (650k pairs × 64 dims). NaN when either
  * norm is zero, matching the HOF version's 0/0.
  *
  * Implements `doGenCode` (not `CodegenFallback`) so scoring projections
  * stay inside whole-stage codegen — the generated loop is the same fold
  * as the interpreted path (PlanAuditSpec pins the codegen span).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_cosine"

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val len = math.min(av.numElements(), bv.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < len) {
      val x = if (leftIsFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (rightIsFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val len = ctx.freshName("len")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $len; $i++) {
         |  double $x = $getA;
         |  double $y = $getB;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorCosine {
  def register(spark: SparkSession, name: String = "vector_cosine"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => VectorCosine(exprs.head, exprs(1)),
      "built-in"
    )
}
