package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  MapState,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  Trigger,
  ValueState
}

/** Typed rows for the transformWithState user-profile operator. */
case class TwsEvent(user_id: Long, event_type: String, cents: Long, us: Long)
case class TwsTotals(n: Long, cents: Long, firstUs: Long, lastUs: Long)
case class TwsProfile(
    user_id: Long,
    n_events: Long,
    n_types: Long,
    cents_sum: Long,
    first_us: Long,
    last_us: Long,
    dom_type: String)

/** Per-user running profile on the new arbitrary-state API
  * (`transformWithState`, Spark 4): a [[ValueState]] carries the scalar
  * totals and a [[MapState]] the per-event-type counts, so the dominant
  * type — an argmax over a per-key DISTRIBUTION, which no single
  * streaming aggregation monoid exposes — is re-derived from live state
  * at every update. State is O(#types) per user, not O(#events): the
  * bounded-state posture that makes the operator safe against an
  * unbounded stream.
  *
  * Emission contract: one row per key per micro-batch that touched it
  * (Update mode), with strictly increasing `n_events` — so "max
  * n_events per key" is the final profile under any batch split, the
  * fact the multi-batch spec test leans on.
  */
class UserProfileProcessor extends StatefulProcessor[Long, TwsEvent, TwsProfile] {

  @transient private var totals: ValueState[TwsTotals] = _
  @transient private var typeCounts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState("totals", Encoders.product[TwsTotals], TTLConfig.NONE)
    typeCounts =
      getHandle.getMapState("typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsProfile] = {
    var t =
      if (totals.exists()) totals.get()
      else TwsTotals(0L, 0L, Long.MaxValue, Long.MinValue)
    rows.foreach { e =>
      t = TwsTotals(
        t.n + 1,
        t.cents + e.cents,
        math.min(t.firstUs, e.us),
        math.max(t.lastUs, e.us))
      val prev = if (typeCounts.containsKey(e.event_type)) typeCounts.getValue(e.event_type) else 0L
      typeCounts.updateValue(e.event_type, prev + 1)
    }
    totals.update(t)
    // dominant type: max count, tie broken to the lexicographically
    // smallest type (matches the oracle's (n DESC, event_type) rank)
    var domType: String = null
    var domN = -1L
    var nTypes = 0L
    typeCounts.iterator().foreach { case (tp, n) =>
      nTypes += 1
      if (n > domN || (n == domN && tp < domType)) { domN = n; domType = tp }
    }
    Iterator.single(TwsProfile(key, t.n, nTypes, t.cents, t.firstUs, t.lastUs, domType))
  }
}

object StatefulProfile {

  /** Project the raw event stream/batch to the processor's typed input:
    * exact integer cents (the house `round(value*100)` idiom) and epoch
    * micros, both computed by codegen'd SQL expressions BEFORE the typed
    * boundary.
    */
  def typedEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      unix_micros(col("ts")).as("us"))

  /** The transformWithState pipeline over an event DataFrame (streaming
    * or — for plan construction only — batch).
    */
  def profileStream(events: DataFrame): DataFrame = {
    val ss = events.sparkSession
    import ss.implicits._
    typedEvents(events)
      .as[TwsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Drain the bounded event stream through the processor with the
    * RocksDB state store (required by transformWithState), restoring the
    * session's provider afterwards. Returns the final per-user profiles:
    * within each key, `n_events` strictly increases across emissions, so
    * the max-n_events row is the final state under any micro-batch split.
    */
  def runUserProfiles(spark: SparkSession, sfDir: String): DataFrame = {
    val drained = drainUpdate(spark, profileStream(StreamingOps.eventsStream(spark, sfDir)))
    finalProfiles(drained)
  }

  /** Latest emission per key (max n_events — see emission contract). */
  def finalProfiles(drained: DataFrame): DataFrame = {
    val ss = drained.sparkSession
    import ss.implicits._
    drained
      .as[TwsProfile]
      .groupByKey(_.user_id)
      .reduceGroups((a, b) => if (a.n_events >= b.n_events) a else b)
      .map(_._2)
      .toDF()
  }

  /** Update-mode AvailableNow drain into a memory sink under the RocksDB
    * provider.
    */
  def drainUpdate(spark: SparkSession, df: DataFrame): DataFrame = {
    val name = s"tws_${System.nanoTime()}"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(
      provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      StreamingOps.withStatePartitions(spark) {
        val q = df.writeStream
          .outputMode("update")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.processAllAvailable()
        finally q.stop()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    spark.table(name)
  }
}
