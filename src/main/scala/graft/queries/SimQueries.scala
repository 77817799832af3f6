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

  val all: Seq[QueryDef] = Seq(q19SimEvents, q20SimStats, q21SimApiUsage, q22SimBoundedFifo)
}
