package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.catalyst.plans.logical
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

  /** True when every leaf-ward path through `p` passes a row-bounding
    * node — an ungrouped aggregate (exactly 1 row), a small limit, or a
    * local/one-row relation — so a nested loop against it is LINEAR in
    * the other side, not quadratic. This is the "scalar broadcast"
    * pattern (`CROSS JOIN (SELECT count(*) …)`), ubiquitous in analytics
    * SQL and harmless at any scale.
    */
  def isBoundedRelation(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => isBoundedRelation(a.executedPlan)
    case q: QueryStageExec => isBoundedRelation(q.plan)
    case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      agg.groupingExpressions.isEmpty || agg.children.forall(isBoundedRelation)
    case l: org.apache.spark.sql.execution.GlobalLimitExec => l.limit <= 1000
    case l: org.apache.spark.sql.execution.LocalLimitExec => l.limit <= 1000
    case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t.limit <= 1000
    case c: org.apache.spark.sql.execution.CollectLimitExec => c.limit <= 1000
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case r if r.getClass.getSimpleName.contains("OneRowRelation") => true
    // Row-MULTIPLYING operators break the bound: a Generate (explode)
    // over a LIMIT-1000 relation can emit arbitrarily many rows, so the
    // all-children-bounded default below would be unsound for them.
    // Exception: a FOLDABLE generator (explode of a literal array /
    // constant sequence) multiplies by a compile-time constant — the
    // ubiquitous parameter-grid idiom (explode(array(1, 4, 16))) stays
    // bounded over a bounded child.
    case g: org.apache.spark.sql.execution.GenerateExec =>
      g.generator.children.forall(_.foldable) && g.children.forall(isBoundedRelation)
    case _: org.apache.spark.sql.execution.ExpandExec => false
    case _ =>
      val kids = p.children
      kids.nonEmpty && kids.forall(isBoundedRelation)
  }

  /** Names of BNLJ/Cartesian nodes where NEITHER input is a bounded
    * relation — the genuinely quadratic class. Scalar-broadcast nested
    * loops pass; an equi-key-less join of two corpus-sized relations
    * does not. The catalogue-wide CI gate (QueriesSmokeSpec) asserts
    * this is empty for every registered query.
    */
  def unboundedOffenders(df: DataFrame): Seq[String] = {
    def walkU(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walkU(a.executedPlan)
      case q: QueryStageExec => walkU(q.plan)
      case _ =>
        val name = p.getClass.getSimpleName
        val here =
          if (Offenders.exists(name.startsWith) &&
              !p.children.exists(isBoundedRelation)) Seq(name)
          else Nil
        here ++ (p.children ++ p.innerChildren.collect { case sp: SparkPlan => sp })
          .flatMap(walkU)
    }
    walkU(df.queryExecution.executedPlan).distinct
  }

  // ----------------------------------------------------- broadcast gate

  /** True when the LOGICAL relation provably passes a row-bounding node —
    * the logical twin of [[isBoundedRelation]], used by
    * [[forcedBroadcastOffenders]] (hints live in the logical plan; by
    * physical-plan time AQE may have legitimately chosen a broadcast for
    * a locally-small relation, which is exactly the case the gate must
    * NOT flag).
    */
  def isBoundedLogical(p: logical.LogicalPlan): Boolean = p match {
    case a: logical.Aggregate =>
      a.groupingExpressions.isEmpty || a.children.forall(isBoundedLogical)
    // 100k-row ceiling: an OOM-class broadcast is hundreds of MB and up;
    // a ≤100k-row relation is at most a few MB — comfortably inside any
    // broadcast threshold. (The physical nested-loop gate keeps its
    // tighter 1000-row bound: there the cost is multiplicative, not
    // additive.) Post-explode probe bounds (panel × rerank/nprobe) land
    // in the 10⁴ range and must pass.
    case l: logical.GlobalLimit => literalLimit(l.limitExpr) <= 100000
    case l: logical.LocalLimit => literalLimit(l.limitExpr) <= 100000
    case _: logical.LocalRelation => true
    case _: logical.OneRowRelation => true
    case r: logical.Range => r.numElements <= BigInt(100000)
    // row-multiplying nodes void any bound their children carry —
    // except a FOLDABLE generator (literal parameter grid), which
    // multiplies by a compile-time constant
    case g: logical.Generate =>
      g.generator.children.forall(_.foldable) && g.children.forall(isBoundedLogical)
    case _: logical.Expand => false
    case _ =>
      p.children.nonEmpty && p.children.forall(isBoundedLogical)
  }

  private def literalLimit(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case _ => Long.MaxValue
    }

  /** Join sides carrying a FORCED broadcast hint (`broadcast(df)` or the
    * SQL BROADCAST hint comment) whose subtree lacks a row-bounding node — the
    * "broadcast a data-dependent relation" anti-pattern: hash-green at
    * test scale, a driver/executor OOM at 100×. AQE-chosen broadcasts
    * never flag (they are proven small at runtime, per query, per
    * scale); only explicit hints — which override AQE's size check
    * unconditionally — are audited. The scalar/probe-set/grid hints the
    * catalogue does want (ungrouped aggregates, LIMIT-bounded probe
    * sets, LocalRelation grids) pass [[isBoundedLogical]] and never
    * flag either.
    *
    * Each offender is reported as `broadcast-hint(side: TopNodeName)`.
    * The catalogue-wide CI gate (QueriesSmokeSpec) asserts this is
    * empty for every registered query, with a written-argument
    * whitelist for fixed-cardinality dimension relations the structural
    * check cannot see (e.g. the 25-row `nation` table).
    */
  /** Broadcast-threshold ADVISOR (the inverse of
    * [[forcedBroadcastOffenders]]): equi-joins where the optimizer's own
    * size estimate says one side fits under `thresholdBytes` — i.e. a
    * broadcast join is available — but the physical plan placed NO
    * broadcast join for it. On a cluster this is the "shuffled a 2 MB
    * dimension against a 100 TB fact" plan: hash-green, and a full
    * fact-table shuffle you never needed. Advisory granularity is the
    * whole plan (candidate count vs planned broadcast count): matching
    * individual logical joins to post-AQE physical nodes is not stable,
    * and the actionable signal — "this query left a broadcast on the
    * table" — doesn't need it. Empty result = no misses. Wired to the
    * catalogue by Round64PropertySpec (canonical dim⋈fact joins must
    * come back clean) next to q609's data-derived advisor table.
    */
  def broadcastMisses(df: DataFrame, thresholdBytes: Long = 10L << 20): Seq[String] = {
    val candidates = df.queryExecution.optimizedPlan.collect {
      case j: logical.Join
          if j.condition.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.EqualTo])) =>
        (j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
    }.filter { case (l, r) => (l min r) <= BigInt(thresholdBytes) }
    if (candidates.isEmpty) return Nil
    def countBroadcast(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countBroadcast(a.executedPlan)
      case q: QueryStageExec => countBroadcast(q.plan)
      case _ =>
        val here =
          if (p.getClass.getSimpleName.startsWith("BroadcastHashJoin")) 1 else 0
        here + (p.children ++ p.innerChildren.collect { case sp: SparkPlan => sp })
          .map(countBroadcast).sum
    }
    val planned = countBroadcast(df.queryExecution.executedPlan)
    if (planned >= candidates.size) Nil
    else
      candidates.drop(planned).map { case (l, r) =>
        s"equi-join with a ${l min r}-byte side (threshold $thresholdBytes) not planned as broadcast " +
          s"(${candidates.size} candidate(s), $planned broadcast join(s) in plan)"
      }
  }

  def forcedBroadcastOffenders(df: DataFrame): Seq[String] = {
    def hinted(h: Option[logical.HintInfo]): Boolean =
      h.exists(_.strategy.contains(logical.BROADCAST))
    df.queryExecution.optimizedPlan.collect {
      case j: logical.Join =>
        val l =
          if (hinted(j.hint.leftHint) && !isBoundedLogical(j.left))
            Seq(s"broadcast-hint(left: ${j.left.nodeName})")
          else Nil
        val r =
          if (hinted(j.hint.rightHint) && !isBoundedLogical(j.right))
            Seq(s"broadcast-hint(right: ${j.right.nodeName})")
          else Nil
        l ++ r
    }.flatten.distinct
  }
}
