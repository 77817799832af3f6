package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without the nested-loop trap.
  *
  * Spark executes a join whose condition is ONLY range predicates
  * (`point BETWEEN lo AND hi`, or interval overlap) as
  * BroadcastNestedLoopJoin — O(|L|·|R|) row comparisons, the first plan
  * to fall over when both sides are large. The scalable composition
  * (preference (a) of the build rules) is the classic binned range join:
  *
  *   1. pick a bin width `w` on the join domain (ideally ≈ the typical
  *      interval length);
  *   2. a point belongs to exactly ONE bin (`floorDiv(p, w)`); an interval
  *      `[lo, hi]` is exploded to every bin it touches
  *      (`sequence(floorDiv(lo,w), floorDiv(hi,w))` — `len/w + 2` rows,
  *      a small constant when `w` matches the data);
  *   3. an equi-join on the bin id (plus any extra equi-keys) collides
  *      only pairs that can possibly match — one keyed shuffle, hash join,
  *      AQE-skew-splittable — and the exact range predicate applied on top
  *      keeps the semantics identical to the θ-join;
  *   4. overlap joins, where BOTH sides explode, would emit a pair once
  *      per shared bin — instead of a `distinct` over the output, each
  *      pair is emitted only from its FIRST shared bin
  *      (`bin == max(binOf(a_lo), binOf(b_lo))`), which is duplicate-free
  *      by construction.
  *
  * Bin arithmetic is exact long floor-division (`(x - pmod(x, w)) / w`) —
  * no doubles, so timestamps in epoch micros are safe across the full
  * range, and negative domains bin correctly (SQL `div` truncates toward
  * zero, which would split bin -1 in half).
  */
object RangeJoin {

  /** Exact floor division of a long column by a positive width. The
    * numerator is a multiple of `w` by construction; computing it in
    * DECIMAL keeps the quotient exact across the FULL long range (Column
    * `/` is double division, which silently loses integer precision past
    * 2^53 — epoch micros are safe there, arbitrary ids are not) and the
    * subtraction overflow-free even within `w` of Long.MinValue (where
    * long `c - pmod` would trip ANSI overflow).
    */
  private[operators] def binOf(c: Column, w: Long): Column =
    ((c.cast("decimal(38,0)") - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Data-driven bin width: the mean interval length of a (sampled)
    * interval relation, rounded UP to the next power of two — each
    * interval then touches O(1) bins (~2 on average) while points stay
    * single-bin. One tiny aggregate job; at 100 TB run it on a slice
    * (`intervals.sample(...)` or a partition pushdown) — the choice only
    * affects constant factors, never correctness. Degenerate inputs
    * (empty relation, all empty intervals) fall back to 1.
    */
  def autoBinSize(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val row = intervals
      .filter(col(loCol).cast("long") <= col(hiCol).cast("long"))
      .agg(avg(col(hiCol).cast("long") - col(loCol).cast("long")))
      .head()
    val mean = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    if (mean <= 1.0) 1L else java.lang.Long.highestOneBit(math.ceil(mean).toLong - 1) << 1
  }

  /** Inner join of `points` to every interval of `intervals` containing
    * the point: `lo <= point <= hi` (inclusive both ends), plus optional
    * extra equi-keys. Output carries all columns of both inputs (names
    * must be disjoint).
    *
    * `pointCol`/`loCol`/`hiCol` must be long-castable on a shared domain
    * (e.g. epoch seconds/micros, unix days). Empty intervals (`lo > hi`)
    * match nothing and are dropped before the explode — `sequence` would
    * otherwise generate a DESCENDING bin range and mis-join.
    *
    * @param binSize bin width on the domain; set ≈ the typical interval
    *                length so each interval touches O(1) bins
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binSize: Long,
      extraKeys: Seq[String] = Nil
  ): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__bin", binOf(col(pointCol).cast("long"), binSize))
    val i = intervals
      .filter(col(loCol).cast("long") <= col(hiCol).cast("long"))
      .withColumn(
        "__bin",
        explode(
          sequence(
            binOf(col(loCol).cast("long"), binSize),
            binOf(col(hiCol).cast("long"), binSize)
          )
        )
      )
    p.join(i, Seq("__bin") ++ extraKeys)
      .filter(
        col(pointCol).cast("long") >= col(loCol).cast("long") &&
          col(pointCol).cast("long") <= col(hiCol).cast("long")
      )
      .drop("__bin")
  }

  /** Inner join of two interval relations on overlap:
    * `a_lo <= b_hi && b_lo <= a_hi` (inclusive ends), plus optional extra
    * equi-keys. Output carries all columns of both inputs (names must be
    * disjoint) and is duplicate-free: each overlapping pair is emitted
    * only from its first shared bin, not once per shared bin.
    *
    * PRECONDITION: intervals must be well-formed (`lo <= hi`). Ill-formed
    * rows are dropped before binning — note this is NOT equivalent to the
    * raw θ-join for such rows: the naive overlap predicate can be true of
    * a degenerate interval (e.g. [5,2] vs [0,10] satisfies
    * `a_lo <= b_hi && b_lo <= a_hi`), but a row whose "interval" is empty
    * as a set overlaps nothing, so dropping it is the set-semantics
    * answer. Callers who need θ-join parity on malformed data must clean
    * or swap the bounds first (`least`/`greatest`).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      binSize: Long,
      extraKeys: Seq[String] = Nil
  ): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def binned(df: DataFrame, lo: String, hi: String, startName: String): DataFrame =
      df.filter(col(lo).cast("long") <= col(hi).cast("long"))
        .withColumn(startName, binOf(col(lo).cast("long"), binSize))
        .withColumn(
          "__bin",
          explode(sequence(col(startName), binOf(col(hi).cast("long"), binSize)))
        )
    val l = binned(left, leftLo, leftHi, "__lstart")
    val r = binned(right, rightLo, rightHi, "__rstart")
    l.join(r, Seq("__bin") ++ extraKeys)
      .filter(
        // first-shared-bin guard: duplicate-free without a distinct
        col("__bin") === greatest(col("__lstart"), col("__rstart")) &&
          col(leftLo).cast("long") <= col(rightHi).cast("long") &&
          col(rightLo).cast("long") <= col(leftHi).cast("long")
      )
      .drop("__bin", "__lstart", "__rstart")
  }
}
