package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union analytics (gaps-and-islands): merge each user's
  * overlapping activity intervals into maximal covered "islands" and
  * report per-user coverage — the exact-union complement of the
  * session-window family ([[Sessionize]], `session_window` streaming):
  * a session closes after a quiet GAP; an island is the union of
  * explicit [start, start+hold) intervals, the shape used for
  * concurrency billing, uptime/SLA coverage, and on-call overlap.
  *
  * Algorithm: the classic one-pass sweep — order a user's intervals by
  * start, carry the running max of interval ends (a window cummax), and
  * cut a new island exactly when the next start lies strictly beyond
  * every end seen so far. Touching intervals (start == running end)
  * merge.
  *
  * Scale shape: one hash exchange on user_id, then two window passes
  * inside the same partitioning (the island cut and the island agg are
  * both user-keyed) — no self-join, no interval×interval work, so a
  * 10⁹-interval user table costs one shuffle. Per-user skew is bounded
  * by that user's own event count (the window is a linear scan, not
  * quadratic).
  */
object Intervals {

  /** Per-user island coverage over `events(user_id, ts, event_id)`,
    * treating each event as the interval [ts, ts + holdSec).
    *
    * Output: (user_id, n_intervals, n_islands, covered_us,
    * longest_island_us) — covered_us is the measure of the interval
    * UNION in exact integer microseconds (no double counting, no
    * float division anywhere).
    */
  def coverageIslands(events: DataFrame, holdSec: Long = 1800L): DataFrame = {
    require(holdSec > 0, "hold must be positive")
    val holdUs = holdSec * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prevMaxEnd = max(col("end_us")).over(byUser.rowsBetween(Window.unboundedPreceding, -1))
    val islands = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("end_us", col("us") + lit(holdUs))
      .withColumn(
        "brk",
        when(prevMaxEnd.isNull || col("us") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byUser))
      .groupBy(col("user_id"), col("island"))
      .agg(
        count(lit(1)).as("n_iv"),
        min(col("us")).as("start_us"),
        max(col("end_us")).as("stop_us"))
    islands
      .groupBy(col("user_id"))
      .agg(
        sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("stop_us") - col("start_us")).as("covered_us"),
        max(col("stop_us") - col("start_us")).as("longest_island_us"))
  }

  /** FIFO matching of per-key supply and demand queues — the
    * inventory-costing / order-fill primitive — via the cumulative-
    * interval identity: walking both queues in order and matching
    * greedily assigns supply s to demand d EXACTLY the quantity their
    * cumulative intervals overlap:
    *
    *   match(s, d) = max(0, min(scum, dcum) − max(scum₀, dcum₀))
    *
    * so the sequential two-pointer walk becomes an equi-join on the
    * key with a θ-overlap filter — per-key bounded, exact integers,
    * no iteration. Inputs: `supply(key, ord, q)` / `demand(key, ord,
    * q)` with `ord` the FIFO arrival order (any sortable type; ties
    * broken by q then arbitrary-but-keyed ord itself must be unique
    * per key for determinism). Output: (key, matched_q) per key with
    * any overlap.
    */
  def fifoMatch(supply: DataFrame, demand: DataFrame): DataFrame = {
    def cums(df: DataFrame, pfx: String): DataFrame = {
      val w = Window.partitionBy(col("key")).orderBy(col("ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
      df.withColumn("cum", sum(col("q")).over(w))
        .select(col("key"), col("cum").as(s"${pfx}cum"),
          (col("cum") - col("q")).as(s"${pfx}cum0"))
    }
    cums(supply, "s")
      .join(cums(demand, "d"), Seq("key"))
      .filter(col("scum0") < col("dcum") && col("dcum0") < col("scum"))
      .select(col("key"),
        (least(col("scum"), col("dcum")) - greatest(col("scum0"), col("dcum0"))).as("m"))
      .groupBy(col("key"))
      .agg(sum(col("m")).as("matched_q"))
  }
}
