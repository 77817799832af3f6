package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite the ubiquitous "latest row per key"
  * window pattern
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) rn FROM t) WHERE rn = 1
  *
  * into a HASH AGGREGATE — `min_by(struct(*), o)` per key (`max_by` for
  * descending) — directly on the logical plan. The window form costs a
  * full shuffle + per-partition SORT of every row (and with an empty
  * PARTITION BY, a single-partition sort — the classic scale killer);
  * the aggregate form is a partial-aggregable hash agg: each map task
  * reduces its input to one row per key before the shuffle, no sort
  * anywhere. At 100 TB that is the difference between shuffling the
  * corpus and shuffling one row per key.
  *
  * Fires only when `spark.graft.top1Rewrite.enabled=true` (the
  * conf-gated posture of [[RangeJoinRewrite]]), and only on the
  * provably-equivalent shape:
  *
  *   - the Window computes exactly `row_number()` (rank/dense_rank keep
  *     ties — not argmin) and the filter pins it to 1 (`rn = 1`,
  *     `rn <= 1`, `rn < 2`; other conjuncts survive as a residual
  *     Filter above the rewrite);
  *   - every ORDER BY key is deterministic and all keys share one
  *     direction (multi-key orderings become one lexicographic struct
  *     comparison). NULLABLE keys are fine: min_by/max_by skip null
  *     orderings while row_number ranks them, so each nullable key is
  *     encoded as a non-null (null_flag, coalesced_value) pair whose
  *     flag realizes the key's declared NULLS FIRST/LAST placement —
  *     parquet-sourced columns (nullable by schema) rewrite too;
  *   - every PARTITION BY key is a bare column.
  *
  * Tie contract: with duplicate ORDER BY keys, `row_number` and
  * `min_by` both return an arbitrary representative of the tied set —
  * the rewrite preserves the contract, not the accident. Callers
  * needing a deterministic row must make the ordering total (append a
  * unique key), with or without this rule.
  *
  * The rewrite preserves the Filter's exact output attributes (same
  * ExprIds; the rank column rematerializes as literal 1), so parent
  * plans resolve untouched. Idempotent: the result has no Window node.
  */
object Top1WindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.top1Rewrite.enabled"

  private def enabled: Boolean =
    conf.getConfString(EnabledConf, "false").trim.equalsIgnoreCase("true")

  def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) if f.resolved =>
        rewriteOf(cond, w).getOrElse(f)
    }

  /** `rn = 1` / `1 = rn` / `rn <= 1` / `rn < 2` on the rank attribute. */
  private def pinsToOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case EqualTo(IntegerLiteral(1), a: Attribute) => a.exprId == rn.exprId
    case LessThanOrEqual(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case LessThan(a: Attribute, IntegerLiteral(2)) => a.exprId == rn.exprId
    case _ => false
  }

  private def rewriteOf(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)) =>
        val rn = alias.toAttribute
        // Spark's own InsertWindowGroupLimit batch may already have
        // slid a per-partition top-1 prefilter under the Window (when
        // this rule runs from experimental.extraOptimizations, which
        // execute later). It keeps exactly the rows that can have
        // rn = 1, so aggregating its CHILD is equivalent and cheaper.
        val child = w.child match {
          case g: WindowGroupLimit => g.child
          case c => c
        }
        val conjuncts = splitConjunctivePredicates(cond)
        val (top1, rest) = conjuncts.partition(pinsToOne(_, rn))
        val dirs = w.orderSpec.map(_.direction).distinct
        val qualifies =
          top1.nonEmpty && w.orderSpec.nonEmpty && dirs.length == 1 &&
            w.orderSpec.forall(so =>
              so.child.deterministic &&
                so.child.references.subsetOf(child.outputSet)) &&
            w.partitionSpec.forall(_.isInstanceOf[Attribute])
        if (!qualifies) return None
        val asc = dirs.head == Ascending

        // min_by/max_by SKIP rows whose ordering is null; row_number
        // RANKS them per NULLS FIRST/LAST. Encode each nullable key as
        // the non-null pair (null_flag, value-or-default): the flag
        // places null rows exactly where the SortOrder declares, the
        // default breaks no ties a sort wouldn't also leave arbitrary.
        val encodedKeys: Seq[Expression] = w.orderSpec.flatMap { so =>
          if (!so.child.nullable) Seq(so.child)
          else {
            val nullWins =
              if (asc) so.nullOrdering == NullsFirst // min_by: smaller wins
              else so.nullOrdering == NullsFirst // max_by: larger wins
            val (nullFlag, valFlag) =
              if (asc) { if (nullWins) (0, 1) else (1, 0) }
              else { if (nullWins) (1, 0) else (0, 1) }
            Seq(
              If(IsNull(so.child), Literal(nullFlag), Literal(valFlag)),
              Coalesce(Seq(so.child, Literal.default(so.child.dataType))))
          }
        }

        val partAttrs = w.partitionSpec.map(_.asInstanceOf[Attribute])
        val ordExpr = encodedKeys match {
          case Seq(single) => single
          case keys => CreateStruct(keys)
        }
        val rowStruct = CreateStruct(child.output)
        val argBest =
          if (dirs.head == Ascending) MinBy(rowStruct, ordExpr)
          else MaxBy(rowStruct, ordExpr)
        val bestAlias = Alias(
          AggregateExpression(argBest, Complete, isDistinct = false),
          "__graft_top1")()
        val agg = Aggregate(
          partAttrs,
          (partAttrs: Seq[NamedExpression]) :+ bestAlias,
          child)
        val best = bestAlias.toAttribute
        // Empty PARTITION BY ⇒ global Aggregate, which on EMPTY input
        // emits one all-null row where Filter(rn=1) over the Window
        // emits zero. The encoded ordering key is never null, so
        // min_by/max_by is null iff the input was empty — filter it.
        // Grouped aggregates emit no row for absent keys; no guard
        // needed there.
        val aggGuarded: LogicalPlan =
          if (partAttrs.isEmpty) Filter(IsNotNull(best), agg) else agg
        val restored: Seq[NamedExpression] =
          child.output.zipWithIndex.map { case (a, i) =>
            if (partAttrs.exists(_.exprId == a.exprId)) a
            else Alias(GetStructField(best, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          } :+ Alias(Literal(1), rn.name)(exprId = rn.exprId, qualifier = rn.qualifier)
        val proj = Project(restored, aggGuarded)
        Some(if (rest.isEmpty) proj else Filter(rest.reduce(And), proj))
      case _ => None
    }
}
