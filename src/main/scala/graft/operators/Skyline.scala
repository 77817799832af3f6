package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (Pareto front) — `SKYLINE OF cost MIN, benefit MAX` from
  * the classic Börzsönyi et al. '01 operator: rows no other row beats on
  * both dimensions (strictly on at least one). The naive form is an
  * inequality anti-join (quadratic, nested-loop); this is the SORT-BASED
  * formulation that makes it lake-scale:
  *
  *   1. collapse to cost LEVELS (`groupBy cost → max(benefit)`) — one
  *      keyed aggregate; intra-level, anything below the level max is
  *      dominated by the same-cost maximum (strict in benefit);
  *   2. a level survives iff its max beats the running max over
  *      STRICTLY cheaper levels (`rows unbounded preceding .. 1
  *      preceding` — ties in both dims survive, equal benefit at higher
  *      cost is dominated);
  *   3. join survivors back to emit the full skyline rows.
  *
  * The only non-keyed step is the running max over the LEVEL relation —
  * distinct-cost-sized, not corpus-sized; at 100 TB with a pathological
  * distinct-cost count the level pass range-partitions by cost and
  * carries partition maxima, the standard prefix-scan split.
  */
object Skyline {

  /** Skyline rows of `df` minimizing `costCol`, maximizing `benefitCol`.
    * Duplicate points on the front all survive (none dominates — both
    * dimensions tie).
    */
  def pareto2d(df: DataFrame, costCol: String, benefitCol: String): DataFrame = {
    val lvl = df
      .groupBy(col(costCol).as("__cost"))
      .agg(max(col(benefitCol)).as("__msize"))
    val prevMax = max(col("__msize")).over(
      Window.orderBy(col("__cost")).rowsBetween(Window.unboundedPreceding, -1))
    val keep = lvl
      .withColumn("__prev", prevMax)
      .filter(col("__prev").isNull || col("__msize") > col("__prev"))
      .select(col("__cost"), col("__msize"))
    df.join(
      keep,
      col(costCol) === col("__cost") && col(benefitCol) === col("__msize"))
      .drop("__cost", "__msize")
  }
}
