package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.SimConfig
import graft.sim.SimOperator

/** §8.0 waiver replacements at BENCH scale.
  *
  * The three sim-family equality replays — q39 ≡ independent per-key
  * direct `SimCore.run`s, q40 ≡ the batch scenario fan-out, q379 ≡ 32
  * independent full-stream simulations — execute in their home specs
  * (SourcesSpec, StreamingSimSpec) at sf0.001 on every `sbt test`. This
  * spec re-runs all three at an env-selected scale factor so the
  * equality story can be closed at the bench SF without taxing the
  * default suite:
  *
  * {{{
  * GRAFT_SIM_EQ_SFDIR=/root/testdata/sf0.1 \
  *   sbt "testOnly graft.SimEqualityScaleSpec"
  * }}}
  *
  * Without the env var every test cancels (`assume`) — the sf0.001
  * replays already ran. Results of the sf0.1 run are recorded in
  * SURVEY §5.
  */
class SimEqualityScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDirOpt = sys.env.get("GRAFT_SIM_EQ_SFDIR")

  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[String] =
    rows.map(_.mkString("|")).toSet

  test("q39 scenario fan-out ≡ independent per-key direct runs at env SF") {
    assume(sfDirOpt.nonEmpty, "set GRAFT_SIM_EQ_SFDIR to run the scale replay")
    val sfDir = sfDirOpt.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Same keyed construction as q39_sim_scenarios (SimQueries.scala).
    val keyed = graft.sources.Tables.events(spark, sfDir)
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
    val fanned = SimOperator
      .simulateScenarios(keyed, (_: String) => SimConfig(numWorkers = 2))
      .collect()
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).toVector.sortBy(_.seq) }
    val direct = keyed.collect().groupBy(_._1).map { case (k, rs) =>
      k -> graft.sim.SimCore
        .run(SimConfig(numWorkers = 2), rs.map(_._2).iterator)
        .toVector.sortBy(_.seq)
    }
    assert(fanned.keySet == direct.keySet)
    for (k <- direct.keys)
      assert(fanned(k) == direct(k), s"scenario $k diverged at $sfDir")
  }

  test("q40 streaming sim ≡ q39 batch fan-out at env SF") {
    assume(sfDirOpt.nonEmpty, "set GRAFT_SIM_EQ_SFDIR to run the scale replay")
    val sfDir = sfDirOpt.get
    val streaming = SparkEntry.queries("q40_stream_sim")(spark, sfDir).collect()
    val batch = SparkEntry.queries("q39_sim_scenarios")(spark, sfDir).collect()
    assert(streaming.nonEmpty)
    assert(canon(streaming) == canon(batch))
  }

  test("q379 32-combo grid ≡ 32 independent full-stream runs at env SF") {
    assume(sfDirOpt.nonEmpty, "set GRAFT_SIM_EQ_SFDIR to run the scale replay")
    val sfDir = sfDirOpt.get
    import spark.implicits._
    val grid = graft.queries.SimQueries.grid32
    val reqs = graft.sources.EventRequests.requests(spark, sfDir).collect().toSeq
    val keyed = grid.keys.toSeq.sorted.flatMap(k => reqs.map(r => (k, r)))
    val fanned = SimOperator
      .simulateScenarios(keyed.toDS(), (k: Int) => grid(k))
      .collect()
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).toVector }
    val direct = grid.map { case (k, cfg) =>
      k -> graft.sim.SimCore.run(cfg, reqs.iterator).toVector
    }
    assert(fanned.keySet == direct.keySet)
    for (k <- direct.keys.toSeq.sorted)
      assert(fanned(k) == direct(k), s"grid combo $k diverged at $sfDir")
  }
}
