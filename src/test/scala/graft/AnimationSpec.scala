package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.sim.SimCore

/** Fixed-step (animation) mode semantics — reference
  * src/simulator.py:148-193: same transition function, one pass per frame,
  * no fixpoint cascade within a frame.
  */
class AnimationSpec extends AnyFunSuite {

  private def req(user: String, arrival: Double, proc: Double, seq: Long): SimRequest =
    SimRequest(user, None, proc, arrival, seq)

  test("fixed-step completes everything the event mode completes") {
    val rs = (0 until 20).map(i => req(s"u$i", i * 0.7, 1.0 + i % 4, i.toLong))
    val event = SimCore.run(SimConfig(numWorkers = 2), rs.iterator).toVector
    val anim = SimCore.runFixedStep(SimConfig(numWorkers = 2), rs.iterator).toVector
    assert(anim.size == event.size)
    assert(anim.map(_.userId).toSet == event.map(_.userId).toSet)
    assert(anim.forall(_.finishTime >= 0))
  }

  test("no intra-frame cascade: a freed worker starts its next task next frame") {
    // Two tasks at t=0, proc 2.0, one worker, interval 1.0:
    // event mode gives start2 = finish1 = 2.0; animation mode completes r1
    // in the t=2 frame and only starts r2 at t=3 (single pass per frame,
    // matching the reference's animation loop).
    val rs = Seq(req("r1", 0.0, 2.0, 0), req("r2", 0.0, 2.0, 1))
    val out = SimCore.runFixedStep(SimConfig(numWorkers = 1), rs.iterator).toVector
    val r2 = out.find(_.userId == "r2").get
    assert(r2.startTime == 3.0)
    assert(r2.finishTime == 5.0)
  }

  test("frames report monotonic time and a drained final state") {
    val rs = (0 until 10).map(i => req(s"u$i", i * 0.5, 1.5, i.toLong))
    val frames = scala.collection.mutable.ArrayBuffer.empty[SimCore.Frame]
    SimCore.runFixedStep(SimConfig(numWorkers = 2), rs.iterator, onFrame = frames += _).toVector
    assert(frames.map(_.currentTime).sliding(2).forall(w => w.size < 2 || w(0) <= w(1)))
    val last = frames.last
    assert(last.pendingCount == 0 && last.queuedCount == 0 && last.activeWorkers == 0)
    assert(last.completedCount == 10)
  }
}
