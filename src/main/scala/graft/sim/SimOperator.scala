package graft.sim

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.model._

/** Spark wrapper around [[SimCore]].
  *
  * The simulation is a globally-sequential fold (one shared queue + one
  * shared rate-limit ledger couple all events — reference:
  * src/simulator.py:57, SURVEY §4.2), so a single scenario is pinned to ONE
  * task via `coalesce(1)` (narrow, no shuffle). Scale-out at 100 TB comes
  * from [[simulateScenarios]]: thousands of independent scenarios
  * (parameter sweeps, per-tenant replays) fan out across the cluster with
  * one ordinary shuffle, each group folded independently.
  */
object SimOperator {

  implicit private val completedEnc: Encoder[SimCompleted] = Encoders.product[SimCompleted]

  /** Run one simulation over the whole dataset. Input order is made
    * deterministic by SimCore's internal stable (simArrivalTime, seq) sort,
    * so no cluster-side sort is needed — `coalesce(1)` is a narrow
    * dependency and the fold streams the single partition.
    */
  def simulate(ds: Dataset[SimRequest], cfg: SimConfig): Dataset[SimCompleted] =
    ds.coalesce(1).mapPartitions(it => SimCore.run(cfg, it))

  /** Scenario fan-out: one independent simulation per key. Each group is
    * materialized in memory by SimCore (a single scenario's event set must
    * fit an executor — document-sized, not lake-sized), while the set of
    * scenarios scales horizontally.
    */
  def simulateScenarios[K](
      ds: Dataset[(K, SimRequest)],
      cfgFor: K => SimConfig
  )(implicit kEnc: Encoder[K], outEnc: Encoder[(K, SimCompleted)]): Dataset[(K, SimCompleted)] =
    ds.groupByKey(_._1)
      .flatMapGroups((k: K, it: Iterator[(K, SimRequest)]) =>
        SimCore.run(cfgFor(k), it.map(_._2)).map(c => (k, c))
      )
}
