package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite a range-ONLY inner join —
  * `p >= lo AND p <= hi` with no usable equi-conjunct, which Spark would
  * otherwise execute as BroadcastNestedLoopJoin — into the binned
  * equi-join of [[graft.operators.RangeJoin]], directly on the logical
  * plan:
  *
  *   - point side gains `__graft_bin_p = floorDiv(p, w)` (exact long
  *     arithmetic: `(x - pmod(x, w)) intdiv w`);
  *   - interval side explodes `sequence(floorDiv(lo, w), floorDiv(hi, w))`
  *     (one row per touched bin);
  *   - the join becomes `__graft_bin_p = __graft_bin_i AND <original
  *     condition>` — an equi-join JoinSelection plans as a hash join —
  *     and a final Project restores the original output.
  *
  * Correct for any bin width: a point lives in exactly one bin, so a
  * (point, interval) pair can collide at most once — no duplicates — and
  * the original predicate still runs on every surviving row. An empty
  * interval (`lo > hi`) explodes to a descending junk bin range, but the
  * original predicate rejects every such row, as the θ-join would have.
  *
  * The rule only fires when `spark.graft.rangeJoin.binSize` is set to a
  * positive long (the caller knows the domain's typical interval length;
  * no default could). It is idempotent: after the rewrite the join HAS an
  * equi-conjunct, so the guard no longer matches — safe under fixed-point
  * rule batches.
  *
  * Registered via [[GraftExtensions]]
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`) or added to
  * a live session with [[GraftExtensions.install]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  private def binSize: Option[Long] =
    conf.getConfString(BinSizeConf, "").trim match {
      case "" => None
      case s => s.toLongOption.filter(_ > 0)
    }

  /** Domains with an exact integral image: ints/longs as-is, dates as
    * unix days, timestamps as epoch micros. The bin width is interpreted
    * in that unit (days for dates, MICROSECONDS for timestamps).
    */
  private def isBinnable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType | TimestampNTZType => UnixMicros(Cast(e, TimestampType))
    case _ => Cast(e, LongType)
  }

  /** Exact floor division on the FULL long domain: (x - pmod(x, w)) / w
    * with the subtraction in decimal(38,0), mirroring
    * [[graft.operators.RangeJoin.binOf]] — raw long `x - pmod(x, w)`
    * overflows for x within w of Long.MinValue (a runtime failure under
    * ANSI mode, Spark 4's default), which would turn a working
    * nested-loop join into a crash.
    */
  private def binOf(e: Expression, w: Long): Expression = {
    val x = asLong(e)
    val width = Literal(w, LongType)
    val dec = DecimalType(38, 0)
    val num = Subtract(Cast(x, dec), Cast(Pmod(x, width), dec))
    Cast(Divide(num, Cast(width, dec)), LongType)
  }

  /** `true` iff `e` only needs `side`'s output and is deterministic. */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  def apply(plan: LogicalPlan): LogicalPlan = binSize match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        // returning `j` itself is reference-equal → transformUp records
        // no change, so the no-match path costs one qualification check
        case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
          rewriteOf(j, left, right, cond, hint, w).getOrElse(j)
      }
  }

  /** The rewritten join, or None when the condition doesn't qualify. */
  private def rewriteOf(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      w: Long
  ): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // An existing cross-side equi-conjunct means JoinSelection already has
    // a hash-join key — nothing to fix.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (from(a, left) && from(b, right)) || (from(a, right) && from(b, left))
      case EqualNullSafe(a, b) =>
        (from(a, left) && from(b, right)) || (from(a, right) && from(b, left))
      case _ => false
    }
    if (hasEqui) return None

    // Find p >= lo and p <= hi over the same point expression, point on
    // one side, both bounds on the other, all integral.
    def lowerOf(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p) => Some((p, lo))
      case _ => None
    }
    def upperOf(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case _ => None
    }

    val candidates = for {
      (pLo, lo) <- conjuncts.flatMap(lowerOf)
      (pHi, hi) <- conjuncts.flatMap(upperOf)
      if pLo.semanticEquals(pHi) && isBinnable(pLo) && isBinnable(lo) && isBinnable(hi)
      (pointSide, intervalSide, flipped) <-
        (if (from(pLo, left) && from(lo, right) && from(hi, right))
           Some((left, right, false))
         else if (from(pLo, right) && from(lo, left) && from(hi, left))
           Some((right, left, true))
         else None).toSeq
    } yield (pLo, lo, hi, pointSide, intervalSide, flipped)

    candidates.headOption.map { case (p, lo, hi, pointSide, intervalSide, flipped) =>
      val binP = Alias(binOf(p, w), "__graft_bin_p")()
      val pointPlan = Project(pointSide.output :+ binP, pointSide)

      // Sequence is time-zone aware; the optimizer runs after ResolveTimeZone,
      // so the zone must be supplied here or the plan is unresolved.
      val seq = Sequence(binOf(lo, w), binOf(hi, w), None, Some(conf.sessionLocalTimeZone))
      val binIAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
      val intervalPlan = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(binIAttr),
        child = intervalSide
      )

      val (newLeft, newRight) =
        if (flipped) (intervalPlan, pointPlan) else (pointPlan, intervalPlan)
      val newCond = And(EqualTo(binP.toAttribute, binIAttr), cond)
      // Restore the original schema (and drop the bin plumbing).
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }.orElse(overlapRewriteOf(j, left, right, cond, conjuncts, hint, w))
  }

  /** Interval-OVERLAP rewrite: `a_lo <= b_hi AND b_lo <= a_hi` with each
    * interval's bounds on one side — the two-sided sibling of the
    * point-in-interval case above. Both sides explode their touched-bin
    * range; the equi-key is the bin, and a FIRST-SHARED-BIN guard
    * (`bin = greatest(binOf(a_lo), binOf(b_lo))`) makes each qualifying
    * pair survive exactly once, so no Distinct is needed.
    *
    * The rewrite is TOTAL — no well-formedness precondition, unlike
    * [[graft.operators.RangeJoin.intervalOverlap]]: `sequence(x, y)`
    * yields the SAME bin SET for a malformed interval (descending
    * sequence covers [min..max]), floor-division is monotone so the guard
    * bin `binOf(max(a_lo, b_lo))` lies in both contiguous bin ranges
    * whenever the original predicate holds, and that predicate is
    * re-applied verbatim on every surviving row. Pure band joins
    * (`b.t BETWEEN a.t - d AND a.t + d`) match the point case first and
    * never reach here.
    */
  private def overlapRewriteOf(
      j: Join,
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      conjuncts: Seq[Expression],
      hint: JoinHint,
      w: Long
  ): Option[LogicalPlan] = {
    // normalize every conjunct to x <= y
    def le(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(x, y) => Some((x, y))
      case GreaterThanOrEqual(y, x) => Some((x, y))
      case _ => None
    }
    val les = conjuncts.flatMap(le)
    val candidates = for {
      (aLo, bHi) <- les if from(aLo, left) && from(bHi, right)
      (bLo, aHi) <- les if from(bLo, right) && from(aHi, left)
      if Seq(aLo, aHi, bLo, bHi).forall(isBinnable)
    } yield (aLo, aHi, bLo, bHi)

    candidates.headOption.map { case (aLo, aHi, bLo, bHi) =>
      val binOut = (side: LogicalPlan, lo: Expression, hi: Expression, n: String) => {
        val startAlias = Alias(binOf(lo, w), s"__graft_start_$n")()
        val withStart = Project(side.output :+ startAlias, side)
        val seq = Sequence(
          startAlias.toAttribute, binOf(hi, w), None, Some(conf.sessionLocalTimeZone))
        val binAttr = AttributeReference(s"__graft_bin_$n", LongType, nullable = false)()
        val gen = Generate(
          Explode(seq),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(binAttr),
          child = withStart
        )
        (gen, startAlias.toAttribute, binAttr)
      }
      val (newLeft, aStart, aBin) = binOut(left, aLo, aHi, "a")
      val (newRight, bStart, bBin) = binOut(right, bLo, bHi, "b")
      val firstSharedBin = EqualTo(aBin, Greatest(Seq(aStart, bStart)))
      val newCond = And(And(EqualTo(aBin, bBin), firstSharedBin), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

/** Session extension wiring (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * the range-join optimizer rule plus SQL registration of every custom
  * kernel expression ([[graft.functions.GraftFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => RangeJoinRewrite)
    extensions.injectOptimizerRule(_ => Top1WindowRewrite)
    extensions.injectPlannerStrategy(_ => AsOfJoinStrategy)
    graft.functions.GraftFunctions.registrations.foreach(extensions.injectFunction)
  }
}

object GraftExtensions {
  /** Add the rewrite + SQL kernel functions to a LIVE session (extensions
    * classes only apply at session construction). Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations = existing :+ RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(Top1WindowRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Top1WindowRewrite
    AsOfJoinStrategy.ensureRegistered(spark)
    graft.functions.GraftFunctions.registerAll(spark)
  }
}
