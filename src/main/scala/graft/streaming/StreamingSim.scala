package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.{SimCompleted, SimConfig, SimRequest}
import graft.sim.SimCore

/** Streaming-stateful simulation: the reference's event loop hosted inside
  * `flatMapGroupsWithState` (SURVEY §2.2 "stateful ops" — the core of the
  * reference, re-expressed on Structured Streaming's state machinery).
  *
  * Each group key is an independent scenario; per micro-batch the group's
  * new arrivals run through the deterministic [[SimCore]] fold. For a
  * bounded replay (Trigger.AvailableNow → one batch) this is exactly the
  * batch semantics — verified in tests against [[graft.sim.SimOperator]].
  * The GroupState carries a processed-count watermark so a multi-batch
  * deployment simulates each batch's arrivals as its own episode;
  * carrying live queue/worker state across batches (a resumable EventLoop)
  * is the designed extension seam.
  */
object StreamingSim {

  implicit private val outEnc: Encoder[(String, SimCompleted)] =
    Encoders.product[(String, SimCompleted)]
  implicit private val stateEnc: Encoder[SimCore.SimState] =
    Encoders.product[SimCore.SimState]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING
  implicit private val inEnc: Encoder[(String, SimRequest)] =
    Encoders.product[(String, SimRequest)]

  /** Resumable per-scenario simulation: the full engine state (queues,
    * in-flight work, rate-limit ledger, RNG position, virtual clock) lives
    * in the GroupState; each micro-batch continues exactly where the
    * previous one stopped and drains its arrivals to completion.
    */
  private def simulateGroup(cfg: SimConfig)(
      key: String,
      rows: Iterator[(String, SimRequest)],
      state: GroupState[SimCore.SimState]
  ): Iterator[(String, SimCompleted)] = {
    val st = state.getOption.getOrElse(SimCore.SimState.initial(cfg))
    val (out, next) =
      SimCore.runIncremental(cfg, st, rows.map(_._2), Double.PositiveInfinity)
    state.update(next)
    out.iterator.map(c => (key, c))
  }

  /** Per-event-type scenarios simulated statefully over the events stream,
    * drained to completion; returns (scenario, completed…) rows.
    */
  def run(spark: SparkSession, sfDir: String, cfg: SimConfig = SimConfig(numWorkers = 2)): DataFrame = {
    val stream = StreamingOps.eventsStream(spark, sfDir)
    val keyed = stream
      .select(
        col("event_type").as("_1"),
        struct(
          col("user_id").cast("string").as("userId"),
          unix_micros(col("ts")).as("requestTimeMicros"),
          col("value").cast("double").as("processingTime"),
          ((unix_micros(col("ts")) - lit(graft.sources.EventRequests.SimOriginMicros)) /
            lit(1000000.0)).as("simArrivalTime"),
          col("event_id").cast("long").as("seq")
        ).as("_2")
      )
      .as[(String, SimRequest)]

    val completed = keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        simulateGroup(cfg)
      )

    val name = s"stream_sim_${System.nanoTime()}"
    val q = completed
      .toDF("scenario", "completed")
      .select(col("scenario"), col("completed.*"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
