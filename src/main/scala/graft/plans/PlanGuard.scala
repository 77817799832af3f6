package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan GUARDRAIL: detects the two physical join shapes that melt at
  * scale — BroadcastNestedLoopJoin and CartesianProduct, both O(|L|·|R|)
  * row comparisons. A pipeline that accidentally loses its equi-key (a
  * typo'd column, a cast that defeats the key, a range-only condition
  * without [[RangeJoinRewrite]]'s bin conf) silently degrades into one of
  * these; on a 100 TB input that is a cluster-week, not a slow query.
  *
  *   - [[offendingNodes]] / [[assertScalable]]: explicit pre-flight check
  *     of one DataFrame (CI gate per pipeline).
  *   - [[install]]: a session-wide [[QueryExecutionListener]] that
  *     records every executed action whose plan contained an offender —
  *     the always-on audit a platform team runs in staging.
  *
  * Detection walks the executed plan INCLUDING AQE's dynamically
  * re-planned subtrees (adaptive plans hide their current physical tree
  * behind `AdaptiveSparkPlanExec`).
  */
object PlanGuard {

  private val Offenders = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  private def walk(p: SparkPlan): Seq[String] = p match {
    // AQE hides the current physical tree behind wrapper nodes with no
    // regular children — descend explicitly
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => walk(q.plan)
    case _ =>
      val name = p.getClass.getSimpleName
      val here = if (Offenders.exists(name.startsWith)) Seq(name) else Nil
      here ++ (p.children ++ p.innerChildren.collect { case sp: SparkPlan => sp })
        .flatMap(walk)
  }

  /** Names of the O(n·m) join nodes in the plan (empty = scalable). */
  def offendingNodes(df: DataFrame): Seq[String] =
    walk(df.queryExecution.executedPlan).distinct

  /** Throw if the plan would nested-loop: the CI pre-flight gate. */
  def assertScalable(df: DataFrame): Unit = {
    val bad = offendingNodes(df)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"plan contains non-scalable join(s): ${bad.mkString(", ")} — " +
          "add an equi-key, broadcast-hint a genuinely small side, or set " +
          s"${RangeJoinRewrite.BinSizeConf} for range-only conditions")
  }

  /** Session-wide audit: every completed action whose plan contained an
    * offender is recorded as (action name, offending node names).
    */
  final class Listener(maxRecorded: Int = 256) extends QueryExecutionListener {
    private val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[String])]
    // recorded slots are claimed atomically — ConcurrentLinkedQueue.size
    // is an O(n) traversal and check-then-act on it can overshoot the cap
    private val recordedCount = new java.util.concurrent.atomic.AtomicLong
    private val droppedCount = new java.util.concurrent.atomic.AtomicLong
    def offenders: Seq[(String, Seq[String])] = {
      val it = hits.iterator(); val b = Seq.newBuilder[(String, Seq[String])]
      while (it.hasNext) b += it.next()
      b.result()
    }
    /** Offenders seen after the buffer filled (always-on sessions stay
      * bounded; the count says how much was elided).
      */
    def dropped: Long = droppedCount.get()
    def clear(): Unit = { hits.clear(); recordedCount.set(0L); droppedCount.set(0L) }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val bad = walk(qe.executedPlan).distinct
      if (bad.nonEmpty) {
        if (recordedCount.incrementAndGet() <= maxRecorded) hits.add((funcName, bad))
        else droppedCount.incrementAndGet()
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Install (and return) the audit listener on a live session. */
  def install(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }
}
