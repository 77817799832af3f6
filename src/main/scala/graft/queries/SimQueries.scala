package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{FifoConfig, PriorityConfig, SimConfig}
import graft.sim.SimOperator
import graft.sources.EventRequests
import graft.stats.Statistics

/** Simulation-backed queries — the reference's actual product pipeline
  * (CSV → simulate → stats, main.py:16-159) re-hosted on the lake's
  * `events` table. Deterministic (seeded RNG, stable sort), but the
  * stateful fold is not SQL-expressible, so these are rows-only checks
  * (no DuckDB oracle), per the driver contract.
  */
object SimQueries {

  /** Default engine config for lake replays: 4 workers over the priority
    * strategy (reference defaults elsewhere: config/settings.py:2,5,
    * src/queue_manager.py:105).
    */
  val defaultConfig: SimConfig = SimConfig(numWorkers = 4)

  private def completedDF(s: SparkSession, dir: String, cfg: SimConfig): DataFrame =
    Statistics.toDF(SimOperator.simulate(EventRequests.requests(s, dir), cfg))

  /** E1/Q1-Q3/W1/C1-C2: the event loop itself — full completed set. */
  val q19SimEvents: QueryDef = QueryDef(
    "q19_sim_events",
    (s, dir) => completedDF(s, dir, defaultConfig),
    None
  )

  /** A1–A6 over the sim output: one-row summary. */
  val q20SimStats: QueryDef = QueryDef(
    "q20_sim_stats",
    (s, dir) => Statistics.summary(completedDF(s, dir, defaultConfig)),
    None
  )

  /** A4 zero-filled per-endpoint usage. */
  val q21SimApiUsage: QueryDef = QueryDef(
    "q21_sim_api_usage",
    (s, dir) => Statistics.apiUsage(completedDF(s, dir, defaultConfig), defaultConfig.numApis),
    None
  )

  /** The documented-but-dead reference configuration made reachable
    * (SURVEY §4.1): bounded FIFO, rejection path live.
    */
  val q22SimBoundedFifo: QueryDef = QueryDef(
    "q22_sim_bounded_fifo",
    (s, dir) =>
      Statistics.summary(
        completedDF(
          s,
          dir,
          SimConfig(numWorkers = 2, strategy = FifoConfig(maxSize = Some(8)))
        )
      ),
    None
  )

  /** S2 datagen re-expressed as rand(seed) + window cumulative sum (the
    * reference's Python RNG stream is not reproducible; determinism is
    * same-seed-same-output within this engine).
    */
  val q38Datagen: QueryDef = QueryDef(
    "q38_datagen",
    (s, _) => graft.sources.DataGen.generate(s, numUsers = 5, maxRequestsPerUser = 5),
    None
  )

  /** Scenario fan-out — the 100 TB posture of the sim operator: one
    * independent simulation per event_type, distributed via
    * groupByKey/flatMapGroups, summarized per scenario (SURVEY §4.2).
    */
  val q39SimScenarios: QueryDef = QueryDef(
    "q39_sim_scenarios",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val events = graft.sources.Tables.events(s, dir)
      val keyed = events
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
        .as[(String, graft.model.SimRequest)]
      val completed = SimOperator
        .simulateScenarios(keyed, (_: String) => SimConfig(numWorkers = 2))
        .toDF("scenario", "completed")
      Statistics.summaryByGroup(
        Statistics.renameToSnake(completed.select(col("scenario"), col("completed.*"))),
        Seq("scenario")
      )
    },
    None
  )

  val all: Seq[QueryDef] = Seq(
    q19SimEvents, q20SimStats, q21SimApiUsage, q22SimBoundedFifo,
    q38Datagen, q39SimScenarios
  )
}
