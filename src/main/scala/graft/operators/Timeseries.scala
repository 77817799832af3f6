package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing. The engine's other temporal tools are
  * calendar-shaped (gap fill, seasonal baselines in [[Drift]]); this one
  * is the classic signal smoother a metrics pipeline runs before
  * thresholding noisy per-entity series.
  */
object Timeseries {

  /** TRUNCATED NORMALIZED EWMA over each key's ordered series:
    *
    *   ewma_t = Σ_{k=0..L-1} (1-α)^k · x_{t-k}  /  Σ_{k=0..L-1} (1-α)^k
    *
    * (pandas `ewm(alpha).mean()` with `adjust=True` restricted to the
    * last L observations). Truncation is what makes it lake-scale: the
    * exact recursive form needs an unbounded running state per key,
    * while the L-term kernel is a bounded sliding window — with
    * (1-α)^L below 1e-2 the difference is under the smoothing noise
    * floor, and each row's work is a fixed L-element fold.
    *
    * One shuffle (key partition); the fold runs on the window's
    * collected slice row-locally. Doubles are folded in ascending-time
    * order on both engines and rounded to 6 places — the documented
    * ordered-fold parity posture for ≲1000-term chains.
    *
    * `ordCols` must be a total order within each key (ambiguous ties
    * would make the window slice — and thus the fold — nondeterministic
    * under retries).
    *
    * Output: input columns + ewma.
    */
  def ewma(
      df: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      valCol: String,
      alpha: Double,
      window: Int
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(window > 0, "window must be positive")
    val beta = 1.0 - alpha
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val weighted =
      s"aggregate(transform(__arr, (x, j) -> x * pow($beta, size(__arr) - 1 - j)), 0d, (a, b) -> a + b)"
    val weights =
      s"aggregate(transform(__arr, (x, j) -> pow($beta, size(__arr) - 1 - j)), 0d, (a, b) -> a + b)"
    df.withColumn("__arr", collect_list(col(valCol)).over(w))
      .withColumn("ewma", round(expr(weighted) / expr(weights), 6))
      .drop("__arr")
  }
}
