package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All blocklist patterns CONTAINED in a text, in one pass — the ids of
  * every pattern that occurs as a substring, ascending, via the classic
  * Aho–Corasick automaton (goto/fail links over the pattern trie).
  *
  * Why an expression and not SQL: `contains(text, p)` per pattern scans
  * the text P times (and as a join predicate against a pattern table it
  * is a nested-loop non-equi join — the planner cannot key it). The
  * automaton walks each character exactly once regardless of P, and the
  * pattern set compiles INTO the plan (no broadcast, no join) — at
  * 100 TB the blocklist scan stays a pure map over the text column.
  * Semantics are exactly "pattern is a substring, case-sensitive" —
  * replayable by any SQL engine as `contains(text, pattern)`, which is
  * what the q456 oracle does.
  *
  * The automaton is built once per (deserialized) expression instance
  * from the literal pattern list; matching marks a per-call bitset so
  * each pattern id is emitted once no matter how often it occurs.
  */
case class AhoCorasickContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression
    with CodegenFallback {

  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty-string pattern")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "aho_contains"

  // trie over chars: goto map per node, fail link, matched pattern ids
  @transient private lazy val automaton: AhoCorasickContains.Automaton =
    AhoCorasickContains.build(patterns)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val a = automaton
    val seen = new Array[Boolean](patterns.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !a.next(s).contains(c)) s = a.fail(s)
      state = a.next(s).getOrElse(c, 0)
      var m = state
      while (m != 0) {
        val out = a.out(m)
        var j = 0
        while (j < out.length) { seen(out(j)) = true; j += 1 }
        m = a.fail(m)
      }
      i += 1
    }
    val ids = (0 until patterns.length).filter(seen).map(_.toLong).toArray
    new GenericArrayData(ids)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickContains {

  /** goto maps, fail links and output pattern ids per trie node. */
  final case class Automaton(
      next: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]])

  private[functions] def build(patterns: Seq[String]): Automaton = {
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        next(s).get(c) match {
          case Some(t) => s = t
          case None =>
            next += Map.empty
            out += Array.empty
            next(s) = next(s) + (c -> (next.length - 1))
            s = next.length - 1
        }
      }
      out(s) = out(s) :+ id
    }
    // BFS fail links
    val fail = Array.fill(next.length)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        // The walk lands strictly shallower than t (depth(fail(s))+1 ≤
        // depth(s) < depth(t)), so this can never resolve to t itself.
        fail(t) = next(f).getOrElse(c, 0)
        assert(fail(t) != t, "fail link must land strictly shallower")
        queue.enqueue(t)
      }
    }
    Automaton(next.toArray, fail, out.toArray)
  }

  /** Register as `name(text)` with the pattern ids fixed at plan time. */
  def register(spark: SparkSession, name: String, patterns: Seq[String]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => AhoCorasickContains(exprs.head, patterns),
      "built-in"
    )
}
