package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension (preference (c) of the build rules):
  * a first-class AS-OF JOIN — logical node, planner strategy, and a
  * sort-merge physical operator — for the temporal-join semantics Spark
  * has no native operator for (reference: the "latest state at or before
  * t" lookup a queue simulator needs for request ↔ state alignment).
  *
  * Semantics (left-outer, backward as-of): for every left row, attach the
  * single latest right row with `right.time <= left.time` on an equal key;
  * unmatched left rows keep nulls. Simultaneous right rows are broken by
  * `rightTieBreaks` ascending, LAST one wins — identical to the composed
  * union+running-last form in [[graft.operators.AsOfJoin.asOf]], which
  * serves as this operator's differential oracle.
  *
  * Physical execution is a single-pass per-partition merge:
  *
  *   - `requiredChildDistribution` clusters both sides on the key, so
  *     EnsureRequirements inserts (or reuses) exactly one hash exchange
  *     per side — same shuffle shape as a shuffled join;
  *   - `requiredChildOrdering` asks for (key, time) ascending, satisfied
  *     by local sort, no global sort;
  *   - `doExecute` zips the co-partitioned sides and streams both sorted
  *     iterators once, carrying at most ONE buffered candidate row —
  *     O(|L|+|R|) time, O(1) state beyond the sort, no per-key
  *     materialization, no row explosion on wide time ranges.
  *
  * At scale this is the plan a native engine would pick: the composed
  * window form must sort |L|+|R| rows through one window function, while
  * this operator's merge consumes the same sort but emits left rows
  * directly — and its state never grows with key cardinality or time
  * range. Skew behaves like any keyed shuffle (AQE still applies to the
  * exchanges underneath).
  *
  * Null semantics match SQL equi-joins: null keys never match (left rows
  * with a null key emit unmatched; right rows with a null key or null
  * time are skipped unread).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreaks: Seq[Expression]
) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinPlan = copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Register at session build
  * via [[GraftExtensions]] or on a live session with [[ensureRegistered]].
  */
object AsOfJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  /** Idempotently add the strategy to a LIVE session (extensions classes
    * only apply at session construction). A duplicate registration next to
    * the extensions-injected copy would be harmless — the planner takes
    * the first candidate — but is avoided anyway.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(AsOfJoinStrategy))
      ex.extraStrategies = ex.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Sort-merge backward as-of join (see [[AsOfJoinPlan]] for semantics and
  * the scale rationale).
  *
  * Both children arrive clustered on the join key and sorted by
  * (key, time[, tieBreaks]) ascending — nulls first, which the merge loop
  * exploits: a null-keyed or null-timed right row can never match and is
  * dropped the moment it is read.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreaks: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  require(
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}"
  )
  require(
    leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}"
  )

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows")
  )

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightTieBreaks).map(SortOrder(_, Ascending))
  )

  /** Left rows stream through in their sorted order, one output row each. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = rightKeys.map(_.dataType)
    val timeType = rightTime.dataType
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else
        new Iterator[InternalRow] {
          private val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
          private val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
          private val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
          private val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
          private val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
          private val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
          // Bind against the nullable-adjusted right schema: unmatched left
          // rows read nulls out of originally non-nullable right columns,
          // and a projection bound non-nullable would skip the null check.
          private val resultProj =
            UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
          private val joined = new JoinedRow
          private val nullRight = new GenericInternalRow(rOut.size)

          // One-row right lookahead; key/time views live in the
          // projections' reused buffers and are only valid until the next
          // advance — the candidate below is copied out for that reason.
          private var rHead: InternalRow = _
          private var rHeadKey: UnsafeRow = _
          private var cand: InternalRow = _
          private var candKey: UnsafeRow = _
          advanceRight()

          private def advanceRight(): Unit = {
            rHead = null
            while (rHead == null && rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              // Null key or null time can never satisfy the match
              // predicate — drop the row here so the merge below only ever
              // sees matchable right rows.
              if (!k.anyNull && !rTimeProj(r).isNullAt(0)) {
                rHead = r
                rHeadKey = k
              }
            }
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            if (lKey.anyNull) {
              // Null keys never match; the right stream is untouched
              // (null-keyed left rows sort before any same-prefix real
              // key, so no matchable right row is being delayed).
              joined(l, nullRight)
            } else {
              // The candidate belongs to the previous left key run.
              if (cand != null && keyOrd.compare(candKey, lKey) != 0) cand = null
              val lTimeRow = lTimeProj(l)
              if (!lTimeRow.isNullAt(0)) {
                // Consume right rows up to this left row's horizon. Left
                // times are non-decreasing within a key, so every row
                // consumed here stays a valid candidate for later left
                // rows of the same key — the candidate only moves forward.
                var done = false
                while (!done && rHead != null) {
                  val c = keyOrd.compare(rHeadKey, lKey)
                  if (c < 0) advanceRight() // key already passed by
                  else if (c > 0) done = true // future key — stop
                  else if (timeOrd.compare(rTimeProj(rHead), lTimeRow) <= 0) {
                    cand = rHead.copy()
                    candKey = rHeadKey.copy()
                    advanceRight()
                  } else done = true // same key, future time — stop
                }
              }
              // A null left time matches nothing (SQL: rt <= NULL is not
              // true); consuming nothing is also safe because null times
              // sort first within the key.
              if (cand != null && !lTimeRow.isNullAt(0)) {
                numMatchedRows += 1
                joined(l, cand)
              } else joined(l, nullRight)
            }
            numOutputRows += 1
            resultProj(joined)
          }
        }
    }
  }
}
