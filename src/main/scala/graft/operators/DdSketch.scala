package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch (Masson/Rim/Lee, VLDB '19) — the relative-error-bounded
  * quantile sketch, built RELATIONALLY like the rest of the
  * deterministic-sketch family ([[CountMin]]/[[Bloom]]/[[Hll]]):
  *
  *   - log-width bins: `i = ⌈ln(x)/ln(γ)⌉` with γ = (1+α)/(1−α); the bin
  *     midpoint `2γ^i/(γ+1)` is within relative error α of every value
  *     in the bin — the guarantee that makes a 2%-accurate p99 cost
  *     O(#bins) space at ANY data scale;
  *   - the sketch is `groupBy (group, bin) count` — partial aggregation
  *     collapses each partition to ≤ #bins rows, and two shard sketches
  *     MERGE by adding bin counts (CMS-style), which is why this — not
  *     an exact sort — is what you run per-shard at 100 TB;
  *   - quantile extraction is a window cumsum + conditional min over the
  *     tiny bin relation: first bin whose cumulative count reaches rank
  *     `⌊q(n−1)⌋+1`.
  *
  * γ is passed as two double literals (1.02/0.98) so both engines derive
  * it with ONE identical division — never `1+α` re-computed in one
  * runtime and written as a decimal in the other. Bin assignment shares
  * the usual last-ulp caveat of cross-engine `ln`: a value within an ulp
  * of a bin boundary could bin differently — measure-zero for real data,
  * same documented posture as the md5-uniform `ln` keys.
  *
  * Exact percentiles ride along as comparison columns (their
  * `quantile_cont` interpolation can exceed α at extreme tail GAPS —
  * the sketch brackets the rank-r order statistic, not the interpolated
  * value between r and r+1).
  */
object DdSketch {

  /** Per-group p50/p95/p99 sketch estimates next to exact percentiles.
    * Only positive values are sketched (the log bin is undefined at
    * ≤ 0); the exact comparison uses the identical filter.
    * Output: (group, n, p50_est, p95_est, p99_est, p50_exact,
    * p95_exact, p99_exact).
    */
  /** The log-γ bin index for a (positive) value. */
  def binCol(value: Column, gammaNum: Double = 1.02, gammaDen: Double = 0.98): Column =
    ceil(log(value) / log(lit(gammaNum) / lit(gammaDen))).cast("long")

  /** The read-time half of the sketch: p50/p95/p99 estimates from a bin
    * relation (group, i, cnt) maintained elsewhere (shard merges — bin
    * counts ADD — or streaming state). Output: (group, n, p50_est,
    * p95_est, p99_est).
    */
  def estimateFromBins(
      bins: DataFrame,
      groupCol: String,
      gammaNum: Double = 1.02,
      gammaDen: Double = 0.98
  ): DataFrame = {
    val gamma: Column = lit(gammaNum) / lit(gammaDen)
    def estOf(iCol: Column): Column =
      round(lit(2) * pow(gamma, iCol) / (gamma + 1), 6)
    selectRanks(bins, groupCol)
      .select(
        col(groupCol),
        col("n"),
        estOf(col("i50")).as("p50_est"),
        estOf(col("i95")).as("p95_est"),
        estOf(col("i99")).as("p99_est"))
  }

  /** Rank selection over a bin relation: cumulative counts, then the
    * first bin whose cumsum reaches rank ⌊q(n−1)⌋+1 per target q.
    */
  private def selectRanks(bins: DataFrame, groupCol: String): DataFrame = {
    val byI = Window
      .partitionBy(col(groupCol))
      .orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(groupCol))
    def rankOf(q: Double): Column = floor(lit(q) * (col("n") - 1)) + 1
    bins
      .withColumn("cum", sum(col("cnt")).over(byI))
      .withColumn("n", sum(col("cnt")).over(whole))
      .groupBy(col(groupCol))
      .agg(
        min(col("n")).as("n"),
        min(when(col("cum") >= rankOf(0.5), col("i"))).as("i50"),
        min(when(col("cum") >= rankOf(0.95), col("i"))).as("i95"),
        min(when(col("cum") >= rankOf(0.99), col("i"))).as("i99"))
  }

  def quantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      gammaNum: Double = 1.02,
      gammaDen: Double = 0.98
  ): DataFrame = {
    val gamma: Column = lit(gammaNum) / lit(gammaDen)
    val v = df.filter(col(valueCol) > 0)
    val bins = v
      .select(col(groupCol), binCol(col(valueCol), gammaNum, gammaDen).as("i"))
      .groupBy(col(groupCol), col("i"))
      .agg(count(lit(1)).as("cnt"))
    def estOf(iCol: Column): Column =
      round(lit(2) * pow(gamma, iCol) / (gamma + 1), 6)
    val sel = selectRanks(bins, groupCol)
    val exact = v
      .groupBy(col(groupCol))
      .agg(
        round(expr(s"percentile($valueCol, 0.5)"), 6).as("p50_exact"),
        round(expr(s"percentile($valueCol, 0.95)"), 6).as("p95_exact"),
        round(expr(s"percentile($valueCol, 0.99)"), 6).as("p99_exact"))
    sel
      // hint-free: per-group exact quantiles are group-keyed
      // (data-dependent cardinality); AQE resolves the build side
      .join(exact, Seq(groupCol))
      .select(
        col(groupCol),
        col("n"),
        estOf(col("i50")).as("p50_est"),
        estOf(col("i95")).as("p95_est"),
        estOf(col("i99")).as("p99_est"),
        col("p50_exact"),
        col("p95_exact"),
        col("p99_exact"))
  }
}
