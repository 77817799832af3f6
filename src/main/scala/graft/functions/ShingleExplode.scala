package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_posexplode(text, n)` — a table-generating function (Catalyst
  * `Generator`, the UDTF extension point next to the scalar kernels and
  * the typed UDAF): one output row per word n-shingle of the text,
  * `(pos INT, shingle STRING)`, 0-based positions, Spark/DuckDB
  * `split(text, ' ')` tokenization (empty segments kept).
  *
  * Completes the user-extensibility surface of SURVEY §2.2 (scalar
  * Expression / Aggregator UDAF / Generator UDTF): usable in a SELECT
  * list (`shingle_posexplode(text, 3) AS (pos, shingle)`) or LATERAL
  * VIEW, it replaces the posexplode(transform(sequence(...)))
  * composition with a single row-local pass — same motivation as
  * [[TokenShingleHashes]], but producing ROWS for relational consumers
  * (inverted indexes, positional joins) rather than a hash set.
  *
  * A NULL or too-short text yields no rows (explode semantics; use
  * LATERAL VIEW OUTER to keep such documents).
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "shingle_posexplode"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val text = v.asInstanceOf[UTF8String].toString
    // split(text, ' ') with limit -1 semantics: every segment kept
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') { words.add(text.substring(start, i)); start = i + 1 }
      i += 1
    }
    words.add(text.substring(start))
    val m = words.size - n + 1
    if (m <= 0) return Nil
    val out = new Array[InternalRow](m)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(j + k))
        k += 1
      }
      out(j) = new GenericInternalRow(Array[Any](j, UTF8String.fromString(sb.toString)))
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
