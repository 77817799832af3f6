package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** As-of join: for each left row, attach the most recent right row with
  * `right.time <= left.time` on the same key.
  *
  * Spark has no built-in as-of join; the scalable composition (preference
  * order (a) of the build rules) is union + running `last(_, ignoreNulls)`
  * window:
  *
  *   1. align both sides into (key, time, side, payload) — right side=0,
  *      left side=1, so at equal times the right row sorts first and an
  *      exactly-simultaneous right row IS visible to the left row (<=);
  *   2. one shuffle by key, one in-partition sort by
  *      (time, side, tieBreak…);
  *   3. running `last(rightPayload, ignoreNulls = true)` carries the
  *      latest right payload forward; left rows read it directly.
  *
  * Cost at scale: exactly one shuffle + sort of |L|+|R| — no range-join
  * row explosion, no per-key collect; skew behaves like any keyed window.
  * This beats the naive `JOIN … ON key AND rt <= lt` + row_number plan
  * (which materializes every (left × earlier-right) pair before pruning).
  */
object AsOfJoin {

  /** @param rightValueCols (rightColumn, outputAlias) pairs to attach;
    *                       null-filled when no right row precedes the left row
    * @param rightTieBreak  orders simultaneous right rows (last one wins),
    *                       e.g. a monotonically increasing id
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil
  ): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightValueCols, rightTieBreak, forward = false)

  /** FORWARD as-of: the EARLIEST right row with `right.time >= left.time`
    * per key (the other `merge_asof` direction — "next scheduled event",
    * "first fill after the order"). Same single-shuffle union + running
    * window, scanned in descending time order so the carried payload is
    * the nearest future row; at equal times the right row is visible
    * (inclusive), and among simultaneous right rows the largest tie-break
    * wins, mirroring the backward contract.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil
  ): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightValueCols, rightTieBreak, forward = true)

  /** Backward as-of with a STALENESS BOUND: a match older than
    * `tolerance` (e.g. "30 days") is nulled out — "most recent order,
    * but only if reasonably fresh", `merge_asof(tolerance=...)`. Runs the
    * plain as-of carrying the matched right time, then applies the bound
    * as a row-local filter; cost is identical to [[asOf]].
    */
  def asOfTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      tolerance: String,
      rightTieBreak: Seq[String] = Nil
  ): DataFrame = {
    val withRt = asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightValueCols :+ (rightTime -> "__asof_rt"), rightTieBreak, forward = false)
    val fresh = col("__asof_rt").isNotNull &&
      col("__asof_rt") >= col(leftTime).cast("timestamp") - expr(s"INTERVAL $tolerance")
    rightValueCols
      .foldLeft(withRt) { case (df, (_, a)) =>
        df.withColumn(a, when(fresh, col(a)))
      }
      .drop("__asof_rt")
  }

  /** NEAREST as-of: the right row minimizing |right.time − left.time|
    * per key (`merge_asof(direction='nearest')`). Composed as one
    * backward and one forward pass (each the single-shuffle union
    * window), then a row-local winner pick: backward wins ties at
    * equal distance, matching pandas. Cost: two keyed shuffles of
    * |L|+|R| — still no pair explosion.
    *
    * Right rows should be unique per (key, time) (dedupe upstream);
    * otherwise each direction applies its own tie-break contract and
    * the winner is whichever direction's champion is nearer.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil
  ): DataFrame = {
    val back = asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightValueCols.map { case (c, a) => (c, s"__b_$a") } :+ (rightTime -> "__bt"),
      rightTieBreak, forward = false)
    val both = asOfImpl(back, right, leftKey, rightKey, leftTime, rightTime,
      rightValueCols.map { case (c, a) => (c, s"__f_$a") } :+ (rightTime -> "__ft"),
      rightTieBreak, forward = true)
    val lt = col(leftTime).cast("timestamp")
    val backWins = col("__bt").isNotNull &&
      (col("__ft").isNull ||
        unix_micros(lt) - unix_micros(col("__bt").cast("timestamp")) <=
        unix_micros(col("__ft").cast("timestamp")) - unix_micros(lt))
    rightValueCols
      .foldLeft(both) { case (df, (_, a)) =>
        df.withColumn(a, when(backWins, col(s"__b_$a")).otherwise(col(s"__f_$a")))
      }
      .drop(rightValueCols.map { case (_, a) => s"__b_$a" }: _*)
      .drop(rightValueCols.map { case (_, a) => s"__f_$a" }: _*)
      .drop("__bt", "__ft")
  }

  private def asOfImpl(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      rightTieBreak: Seq[String],
      forward: Boolean
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightValueCols.map { case (c, a) => col(c).as(a) }: _*)

    val r = right.select(
      Seq(
        col(rightKey).as("__key"),
        col(rightTime).cast("timestamp").as("__time"),
        lit(0).as("__side"),
        payload.as("__r")
      ) ++ rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*
    )
    // Left rows carry a null right-payload and null tie-breaks; nulls sort
    // first ASC but __side=1 already places left rows after every right row
    // at the same instant, so the tie-break columns never reorder across
    // sides.
    // Key columns must share a type across sides (caller casts if needed).
    val l = left.select(
      Seq(
        col(leftKey).cast(r.schema("__key").dataType).as("__key"),
        col(leftTime).cast("timestamp").as("__time"),
        lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r")
      ) ++ rightTieBreak.indices.map(i =>
        lit(null).cast(r.schema(s"__tb$i").dataType).as(s"__tb$i")
      ) ++ leftCols.map(c => left(c)): _*
    )

    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Forward scans in DESCENDING time: the running last then carries the
    // NEAREST FUTURE right row. Side and tie-break orders are unchanged —
    // right rows stay visible at equal times, max tie-break still wins.
    val order: Seq[Column] =
      Seq(if (forward) col("__time").desc else col("__time").asc, col("__side").asc) ++
        rightTieBreak.indices.map(i => col(s"__tb$i").asc)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    matched.select(
      leftCols.map(col) ++
        rightValueCols.map { case (_, a) => col(s"__asof.$a").as(a) }: _*
    )
  }

  /** The same as-of semantics through the engine's first-class physical
    * operator ([[graft.plans.AsOfJoinExec]] — preference (c): custom
    * LogicalPlan + SparkStrategy + SparkPlan): one hash exchange per side,
    * local (key, time) sorts, then a single-pass per-partition merge with
    * O(1) state. Differentially tested against [[asOf]] and the q24
    * DuckDB oracle.
    *
    * Parameter contract is identical to [[asOf]]; at equal right times the
    * largest tie-break wins on both paths.
    */
  def asOfExec(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil
  ): DataFrame = {
    val spark = left.sparkSession
    AsOfJoinStrategy.ensureRegistered(spark)

    // Pre-prune the right side to (key, time, tie-breaks, values): column
    // pruning does not see through a custom logical node, so the scan
    // width is fixed here instead.
    val r2 = right.select(
      Seq(
        col(rightKey).as("__rk"),
        col(rightTime).cast("timestamp").as("__rt")
      ) ++ rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }
        ++ rightValueCols.map { case (c, a) => col(c).as(a) }: _*
    )
    val keyType = r2.schema("__rk").dataType
    val l2 = left
      .withColumn("__lk", col(leftKey).cast(keyType))
      .withColumn("__lt", col(leftTime).cast("timestamp"))

    val lPlan = l2.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalStateException(s"internal as-of column $n missing")
      )

    val plan = AsOfJoinPlan(
      lPlan,
      rPlan,
      leftKeys = Seq(attr(lPlan, "__lk")),
      rightKeys = Seq(attr(rPlan, "__rk")),
      leftTime = attr(lPlan, "__lt"),
      rightTime = attr(rPlan, "__rt"),
      rightTieBreaks = rightTieBreak.indices.map(i => attr(rPlan, s"__tb$i"))
    )
    SqlBridge
      .ofRows(spark, plan)
      .select(
        left.columns.map(col).toSeq ++
          rightValueCols.map { case (_, a) => col(a) }: _*
      )
  }
}
