package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Right-censored survival analysis over an event stream — "how long do
  * users stay active?", answered without the bias of treating
  * still-active users as churned.
  */
object Survival {

  private val grid30 = 1073741824.0 // 2^30
  private def snap(c: org.apache.spark.sql.Column) = floor(c * grid30 + 0.5) / grid30

  /** Kaplan–Meier survival estimator over per-user observed lifetimes.
    *
    * Lifetime = whole hours between a user's first and last event
    * (exact µs integer arithmetic — no float timestamps). Users whose
    * last event falls inside the final `censorHours` of the corpus
    * clock are RIGHT-CENSORED: still active, their lifetime is only a
    * lower bound, so they stay in the at-risk set through their observed
    * duration but contribute no churn event (the standard
    * deaths-before-censorings-at-t convention).
    *
    *   S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)
    *
    * computed as exp(Σ ln(1 − d/n)) with each addend snapped to the
    * 2⁻³⁰ dyadic grid before summing (the [[Drift.jsVsRest]] posture:
    * order-insensitive, DuckDB-replayable). If the at-risk set ever
    * drains completely (d = n), survival is exactly 0 from that point.
    *
    * Scale shape: one keyed agg to per-user lifetimes (map-side
    * combined), then the entire curve lives on the DURATION histogram —
    * bounded by the corpus time span in hours, not the user count — so
    * the single ordered window is histogram-sized at any scale.
    *
    * Output (only durations with churn events, the standard KM support):
    * (t_hours, n_risk, n_events, survival).
    */
  def kaplanMeier(events: DataFrame, censorHours: Int = 24): DataFrame = {
    require(censorHours >= 0, "censorHours must be non-negative")
    val horizon = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    val lifetimes = events
      .groupBy(col("user_id"))
      .agg(
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .crossJoin(broadcast(horizon))
      .select(
        expr("(last_us - first_us) div 3600000000").as("t_hours"),
        (col("last_us") > col("max_us") - lit(censorHours.toLong * 3600000000L))
          .as("censored"))
    val byT = lifetimes
      .groupBy(col("t_hours"))
      .agg(
        count(lit(1)).as("n_at_t"),
        sum(when(col("censored"), 0L).otherwise(1L)).as("n_events"))
    val total = lifetimes.agg(count(lit(1)).as("n_total"))
    val wExcl = Window.orderBy(col("t_hours")).rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.orderBy(col("t_hours")).rowsBetween(Window.unboundedPreceding, 0)
    byT
      .crossJoin(broadcast(total))
      .withColumn(
        "n_risk",
        col("n_total") - coalesce(sum(col("n_at_t")).over(wExcl), lit(0L)))
      .withColumn(
        "add",
        when(
          col("n_events") < col("n_risk"),
          snap(log(lit(1.0) - col("n_events").cast("double") / col("n_risk")))))
      .withColumn("dead", when(col("n_events") >= col("n_risk"), 1).otherwise(0))
      .withColumn("cum", sum(col("add")).over(wIncl))
      .withColumn("any_dead", max(col("dead")).over(wIncl))
      .filter(col("n_events") > 0)
      .select(
        col("t_hours"),
        col("n_risk"),
        col("n_events"),
        round(when(col("any_dead") === 1, 0.0).otherwise(exp(col("cum"))), 6)
          .as("survival"))
  }
}
