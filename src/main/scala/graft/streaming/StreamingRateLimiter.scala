package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The reference's sliding-window rate limiter (C1,
  * reference: src/api_client.py:17-24) as a KEYED STREAMING operator —
  * the §2.2 matrix notes windowed counts only approximate it; exact
  * parity needs the event-time deque, which is precisely what
  * `ListState` holds here:
  *
  *   - per key, the timestamps of previously ALLOWED events inside the
  *     window (the reference's `deque` of request times);
  *   - an arriving event first evicts entries with `now - ts > window`
  *     (STRICT >: an entry exactly `window` old still counts, matching
  *     the reference), is allowed iff fewer than `limit` remain, and its
  *     own timestamp joins the deque only when allowed.
  *
  * Rows inside a micro-batch arrive unordered, so the processor sorts
  * each key's batch slice by (event time, id) before folding — arrival
  * order across batches is the stream's order, as in any CDC/log replay.
  * State is O(limit) timestamps per key, eviction is amortized O(1):
  * at 100 TB/day the store holds one small deque per ACTIVE key.
  */
object StreamingRateLimiter {

  final case class Event(user_id: Long, event_id: Long, ts_us: Long)
  final case class Decision(user_id: Long, event_id: Long, ts_us: Long, allowed: Boolean)

  class Limiter(limit: Int, windowUs: Long)
      extends StatefulProcessor[Long, Event, Decision] {
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long](
        "recent", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues
    ): Iterator[Decision] = {
      val deque = scala.collection.mutable.Queue[Long]()
      if (recent.exists()) recent.get().foreach(deque.enqueue(_))
      val out = rows.toSeq
        .sortBy(e => (e.ts_us, e.event_id))
        .map { e =>
          while (deque.nonEmpty && e.ts_us - deque.head > windowUs) deque.dequeue()
          val allowed = deque.size < limit
          if (allowed) deque.enqueue(e.ts_us)
          Decision(key, e.event_id, e.ts_us, allowed)
        }
      recent.clear()
      if (deque.nonEmpty) recent.put(deque.toArray)
      out.iterator
    }
  }

  /** Rate-limit decisions over a streaming event frame with
    * (user_id, event_id, ts) columns.
    */
  def decisions(
      events: DataFrame,
      limit: Int,
      windowUs: Long
  ): org.apache.spark.sql.Dataset[Decision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new Limiter(limit, windowUs), TimeMode.None(), OutputMode.Update())
  }
}
