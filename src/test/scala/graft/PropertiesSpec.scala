package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.sim.SimCore

/** Property sweeps over the simulation core (invariants the golden tests
  * can't cover): conservation, timeline sanity, queue discipline,
  * determinism under permutation. Deterministic seeded generation — every
  * case is reproducible by its iteration index.
  */
class PropertiesSpec extends AnyFunSuite {

  private val Cases = 60

  private def genCase(seed: Int): (List[SimRequest], SimConfig) = {
    val rng = new scala.util.Random(seed)
    val n = rng.nextInt(60)
    val rs = (0 until n).map { i =>
      SimRequest(
        s"u$i",
        None,
        rng.nextInt(400) / 10.0,
        rng.nextInt(300) / 10.0,
        i.toLong
      )
    }.toList
    val cfg = SimConfig(
      numWorkers = 1 + rng.nextInt(4),
      strategy =
        if (rng.nextBoolean()) FifoConfig(if (rng.nextBoolean()) Some(1 + rng.nextInt(10)) else None)
        else PriorityConfig(),
      rngSeed = rng.nextLong()
    )
    (rs, cfg)
  }

  test("conservation: every request completes exactly once (processed or rejected)") {
    for (i <- 0 until Cases) {
      val (rs, cfg) = genCase(i)
      val out = SimCore.run(cfg, rs.iterator).toVector
      assert(out.size == rs.size, s"case $i")
      assert(out.map(_.seq).sorted == rs.map(_.seq).sorted, s"case $i")
    }
  }

  test("timeline sanity: arrival <= start <= finish; finish == start + proc") {
    for (i <- 0 until Cases) {
      val (rs, cfg) = genCase(i)
      val out = SimCore.run(cfg, rs.iterator).toVector
      out.filter(_.finishTime != -1).foreach { c =>
        assert(c.arrivalTimeInQueue <= c.startTime + 1e-9, s"case $i")
        assert(c.startTime <= c.finishTime + 1e-9, s"case $i")
        assert(math.abs(c.finishTime - (c.startTime + c.processingTime)) < 1e-9, s"case $i")
        assert(c.arrivalTimeInQueue >= c.simArrivalTime - 1e-9, s"case $i")
      }
      out.filter(_.finishTime == -1).foreach(c => assert(c.status == "rejected", s"case $i"))
    }
  }

  test("priority discipline: only sub-threshold tasks route to the priority queue") {
    for (i <- 0 until Cases) {
      val (rs, _) = genCase(i)
      val out = SimCore.run(SimConfig(numWorkers = 2), rs.iterator).toVector
      out.filter(_.finishTime != -1).foreach { c =>
        if (c.processingTime < 20.0) assert(c.queue.contains("priority"), s"case $i")
        else assert(c.queue.contains("normal"), s"case $i")
      }
    }
  }

  test("determinism: input permutation never changes the outcome") {
    for (i <- 0 until Cases) {
      val (rs, cfg) = genCase(i)
      val a = SimCore.run(cfg, rs.iterator).toVector
      val b = SimCore.run(cfg, new scala.util.Random(i).shuffle(rs).iterator).toVector
      assert(a == b, s"case $i")
    }
  }

  test("no rejection without a binding bound; conservation under rejection") {
    for (i <- 0 until Cases) {
      val (rs, _) = genCase(i)
      val unbounded = SimCore.run(SimConfig(numWorkers = 1), rs.iterator).toVector
      assert(unbounded.forall(_.finishTime != -1), s"case $i")
      val bounded = SimCore
        .run(SimConfig(numWorkers = 1, strategy = FifoConfig(Some(1 + i % 5))), rs.iterator)
        .toVector
      assert(bounded.size == rs.size, s"case $i")
    }
  }

  test("final order: finish-time ascending with rejected rows last") {
    for (i <- 0 until Cases) {
      val (rs, cfg) = genCase(i)
      val out = SimCore.run(cfg, rs.iterator).toVector
      val keys = out.map(c =>
        (if (c.finishTime != -1) c.finishTime else Double.PositiveInfinity, c.arrivalTimeInQueue)
      )
      assert(keys == keys.sorted, s"case $i")
    }
  }

  test("fixed-step mode preserves conservation and timeline sanity") {
    for (i <- 0 until Cases / 2) {
      val (rs, cfg) = genCase(i)
      val out = SimCore.runFixedStep(cfg, rs.iterator).toVector
      assert(out.size == rs.size, s"case $i")
      out.filter(_.finishTime != -1).foreach { c =>
        assert(math.abs(c.finishTime - (c.startTime + c.processingTime)) < 1e-9, s"case $i")
      }
    }
  }
}
