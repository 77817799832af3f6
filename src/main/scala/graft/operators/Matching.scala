package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Observational-causal matching: EXACT-plus-NEAREST neighbor matching
  * with a caliper (the workhorse propensity/covariate matching design —
  * Rosenbaum & Rubin '85's "caliper matching", here with replacement,
  * which is order-free and therefore relational; greedy WITHOUT
  * replacement is an inherently sequential global scan and is the one
  * variant deliberately not offered).
  *
  * Each treated unit matches the nearest control on an exact integer
  * covariate `x`, restricted to the same `block` (the exact-match
  * layer — analysis is per-block, so the sort is a PARTITIONED window,
  * never a global one: at 100 TB the block key is what keeps every
  * sort local). Nearest is resolved from two frames over the
  * (x, t, id)-ordered block — the last control at or below x and the
  * first strictly above — with deterministic ties: controls sharing a
  * treated unit's x sort before it (t asc), equal distances resolve to
  * the lower-x side, and the frame order makes the within-x choice
  * unique. `last/first IGNORE NULLS` of x and y pick fields off the
  * SAME row because both are null exactly when the row is untreated.
  *
  * The ATT is then the average treated-minus-matched-control outcome
  * over matches within the caliper — integer differences, one divide,
  * round-6.
  *
  * Output: one row (n_treated, n_matched, match_rate, avg_abs_dx, att).
  */
object Matching {

  /** @param df      rows (block, id, t ∈ {0,1}, x: long covariate, y: long outcome)
    * @param caliper max |x_treated − x_control| for a valid match
    */
  def nearestCaliperAtt(df: DataFrame, caliper: Long): DataFrame = {
    val ord = Window.partitionBy(col("block")).orderBy(col("x"), col("t"), col("id"))
    val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
    val ctlX = when(col("t") === 0, col("x"))
    val ctlY = when(col("t") === 0, col("y"))
    val cand = df
      .withColumn("xp", last(ctlX, ignoreNulls = true).over(prevW))
      .withColumn("yp", last(ctlY, ignoreNulls = true).over(prevW))
      .withColumn("xn", first(ctlX, ignoreNulls = true).over(nextW))
      .withColumn("yn", first(ctlY, ignoreNulls = true).over(nextW))
      .filter(col("t") === 1)
      .withColumn("usePrev",
        col("xp").isNotNull &&
          (col("xn").isNull || (col("x") - col("xp")) <= (col("xn") - col("x"))))
      .withColumn("xc", when(col("usePrev"), col("xp")).otherwise(col("xn")))
      .withColumn("yc", when(col("usePrev"), col("yp")).otherwise(col("yn")))
      .withColumn("dx", abs(col("x") - col("xc")))
    cand
      .agg(
        count(lit(1)).as("n_treated"),
        sum(when(col("dx") <= caliper, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("dx") <= caliper, col("dx"))).as("sdx"),
        sum(when(col("dx") <= caliper, col("y") - col("yc"))).as("sdy"))
      .select(
        col("n_treated"), col("n_matched"),
        round(col("n_matched").cast("double") / col("n_treated"), 6).as("match_rate"),
        round(col("sdx").cast("double") / col("n_matched"), 6).as("avg_abs_dx"),
        round(col("sdy").cast("double") / col("n_matched"), 6).as("att"))
  }
}
