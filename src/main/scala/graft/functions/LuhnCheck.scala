package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn checksum validation (ISO/IEC 7812) — the payment-card-number
  * filter a PII scan runs over regex-extracted digit runs: doubling
  * every second digit from the right (subtracting 9 past 9) must sum to
  * a multiple of 10. Strings with any non-digit, or fewer than 2
  * digits, are invalid — candidate extraction (the `[0-9]{13,19}`
  * regex) is the caller's job, this is the arithmetic gate that
  * separates card numbers from phone numbers and ids.
  *
  * Native Catalyst expression (preference (b)): codegen emits one
  * static call over the UTF8String bytes — digits are ASCII, so the
  * loop reads raw bytes with no decode, no boxing, inside whole-stage
  * codegen.
  */
case class LuhnCheck(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_check"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_check requires string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(LuhnCheck.valid(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LuhnCheck.valid($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LuhnCheck {

  /** Luhn over the raw UTF-8 bytes (digits are single-byte ASCII). */
  def valid(s: UTF8String): Boolean = {
    val b = s.getBytes
    val n = b.length
    if (n < 2) return false
    var sum = 0
    var double = false
    var i = n - 1
    while (i >= 0) {
      val c = b(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      double = !double
      i -= 1
    }
    sum % 10 == 0
  }

  /** Register as `name(str)` for SQL use.
    *
    * Default name is `graft_luhn_check`, NOT `luhn_check`: Spark 3.5+
    * ships a built-in of that name, and this expression deliberately
    * diverges for short inputs (the built-in treats single-digit '0' as
    * valid; this returns false for anything under 2 digits — a lone
    * check digit is not a card number). Registering under the built-in's
    * name would silently change `luhn_check` semantics for the whole
    * session.
    */
  def register(spark: SparkSession, name: String = "graft_luhn_check"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => LuhnCheck(exprs.head),
      "built-in"
    )
}
