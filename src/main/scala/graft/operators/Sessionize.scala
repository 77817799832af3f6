package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization + marketing-style attribution over an event
  * stream — the gaps-and-islands twin of the streaming session windows
  * (q48/q68), taken one step further to the attribution report.
  */
object Sessionize {

  /** First-touch attribution with conversion rates: events split into
    * sessions at inactivity gaps > `gapSec`; each session is attributed
    * to its FIRST event's type (µs timestamp order, event_id tie-break);
    * a session converts if it contains a 'purchase'. Two window passes
    * over user-partitioned events (lag for the break flags, running sum
    * for session ids) — one user-keyed shuffle total, then group-sized
    * aggregates.
    *
    * Output per first-touch type: (first_type, n_sessions, n_converted,
    * cvr).
    */
  def firstTouchAttribution(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    require(gapSec > 0, "gapSec must be positive")
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = events.select(
      col("user_id"),
      col("event_id"),
      col("event_type"),
      unix_micros(col("ts")).as("us"))
    val lagUs = lag(col("us"), 1).over(byUser)
    val s = e
      .withColumn(
        "brk",
        when(lagUs.isNull || col("us") - lagUs > gapSec * 1000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("brk")).over(byUser))
    val bySession = Window
      .partitionBy(col("user_id"), col("sess"))
      .orderBy(col("us"), col("event_id"))
    s
      .withColumn("first_type", first(col("event_type")).over(bySession))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("first_type")).as("first_type"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchased"))
      .groupBy(col("first_type"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("purchased")).as("n_converted"),
        round(sum(col("purchased")) / count(lit(1)), 6).as("cvr"))
  }
}
