package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.sim.SimCore

/** The resumable increment API: folding time-ordered slices through
  * runIncremental (horizon = slice max, final flush at +∞) must reproduce
  * the one-shot batch run exactly — state (queues, in-flight work,
  * rate-limit ledger, RNG position, clock) survives the snapshot.
  */
class IncrementalSimSpec extends AnyFunSuite {

  private def req(user: String, arrival: Double, proc: Double, seq: Long): SimRequest =
    SimRequest(user, None, proc, arrival, seq)

  private def mkRequests(n: Int, seed: Int): Vector[SimRequest] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      req(s"u$i", rng.nextInt(600) / 10.0, rng.nextInt(300) / 10.0, i.toLong)
    }.toVector
  }

  private def incremental(
      cfg: SimConfig,
      slices: Seq[Vector[SimRequest]]
  ): Vector[SimCompleted] = {
    var state = SimCore.SimState.initial(cfg)
    val out = Vector.newBuilder[SimCompleted]
    slices.foreach { slice =>
      val horizon = if (slice.isEmpty) state.currentTime else slice.map(_.simArrivalTime).max
      val (done, next) = SimCore.runIncremental(cfg, state, slice.iterator, horizon)
      out ++= done
      state = next
    }
    val (tail, _) =
      SimCore.runIncremental(cfg, state, Iterator.empty, Double.PositiveInfinity)
    out ++= tail
    out.result()
  }

  private def canon(v: Seq[SimCompleted]): Seq[SimCompleted] =
    v.sortBy(c =>
      (if (c.finishTime != -1) c.finishTime else Double.PositiveInfinity, c.arrivalTimeInQueue, c.seq)
    )

  test("3 time-ordered slices + flush ≡ one-shot batch (priority strategy, rate limits active)") {
    for (seed <- 1 to 8) {
      val rs = mkRequests(50, seed).sortBy(_.simArrivalTime)
      // Tight rate limit so the ledger state matters across slices.
      val cfg = SimConfig(numWorkers = 3, numApis = 2, rpmLimit = 5)
      val batch = SimCore.run(cfg, rs.iterator).toVector
      // Cut between distinct event times (contract: a slice boundary must
      // not split a same-instant arrival group).
      val times = rs.map(_.simArrivalTime).distinct.sorted
      val (cut1, cut2) = (times(times.size / 3), times(2 * times.size / 3))
      val slices = Seq(
        rs.filter(_.simArrivalTime <= cut1),
        rs.filter(r => r.simArrivalTime > cut1 && r.simArrivalTime <= cut2),
        rs.filter(_.simArrivalTime > cut2)
      )
      val inc = incremental(cfg, slices)
      assert(canon(inc) == canon(batch), s"seed $seed")
    }
  }

  test("slice boundaries cannot leak work: increment output only contains events up to its horizon") {
    val rs = mkRequests(40, 3).sortBy(_.simArrivalTime)
    val cfg = SimConfig(numWorkers = 2)
    val mid = rs(rs.size / 2).simArrivalTime
    val (first, second) = rs.partition(_.simArrivalTime <= mid)
    var state = SimCore.SimState.initial(cfg)
    val (done1, s1) = SimCore.runIncremental(cfg, state, first.iterator, mid)
    assert(done1.forall(_.finishTime <= mid))
    state = s1
    val (done2, s2) = SimCore.runIncremental(
      cfg, state, second.iterator, Double.PositiveInfinity)
    assert(done1.size + done2.size == rs.size)
    // Final state is drained.
    assert(s2.priorityQ.isEmpty && s2.normalQ.isEmpty && s2.workers.forall(_.task.isEmpty))
  }

  test("bounded FIFO rejection state survives the snapshot") {
    // Distinct arrival times: the contract requires slice boundaries to
    // fall between event times (splitting a same-instant group changes
    // bounded-queue admission — see runIncremental scaladoc).
    val cfg = SimConfig(numWorkers = 1, strategy = FifoConfig(Some(2)))
    val rs = (0 until 12).map(i => req(s"u$i", i * 1.0, 10.0, i.toLong)).toVector
    val batch = SimCore.run(cfg, rs.iterator).toVector
    assert(batch.exists(_.status == "rejected"))
    val inc = incremental(cfg, Seq(rs.take(6), rs.drop(6)))
    assert(canon(inc) == canon(batch))
    assert(inc.count(_.status == "rejected") == batch.count(_.status == "rejected"))
  }

  test("late data (arrival before the resumed clock) clamps to current virtual time") {
    val cfg = SimConfig(numWorkers = 1)
    val (done1, s1) = SimCore.runIncremental(
      cfg,
      SimCore.SimState.initial(cfg),
      Iterator(req("a", 0.0, 5.0, 0)),
      Double.PositiveInfinity
    )
    assert(done1.head.finishTime == 5.0 && s1.currentTime == 5.0)
    val (done2, _) = SimCore.runIncremental(
      cfg, s1, Iterator(req("late", 1.0, 2.0, 1)), Double.PositiveInfinity)
    // Arrived "at 1.0" but the clock is already at 5.0 → enqueued at 5.0.
    assert(done2.head.arrivalTimeInQueue == 5.0)
    assert(done2.head.startTime == 5.0 && done2.head.finishTime == 7.0)
  }
}
