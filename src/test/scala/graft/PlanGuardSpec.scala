package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin
import graft.plans.PlanGuard

/** Plan guardrail + data-driven range-join bin sizing. */
class PlanGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("assertScalable passes an equi-join and trips a range-only nested loop") {
    val a = (1L to 50L).toDF("x")
    val b = (1L to 50L).map(i => (i, i + 5)).toDF("lo", "hi")
    PlanGuard.assertScalable(a.join(b, col("x") === col("lo")))
    val nested = a.join(b, col("x") >= col("lo") && col("x") <= col("hi"))
    val e = intercept[IllegalStateException](PlanGuard.assertScalable(nested))
    assert(e.getMessage.contains("BroadcastNestedLoopJoin"))
    // the binned rewrite of the same condition passes the guard
    PlanGuard.assertScalable(
      RangeJoin.pointInInterval(a, b, "x", "lo", "hi", binSize = 8))
  }

  test("guard trips an explicit cross join") {
    val a = (1L to 10L).toDF("x")
    val b = (1L to 10L).toDF("y")
    assert(PlanGuard.offendingNodes(a.crossJoin(b)).nonEmpty)
  }

  test("listener records offending actions session-wide") {
    val l = PlanGuard.install(spark)
    try {
      l.clear()
      val a = (1L to 20L).toDF("x")
      val b = (1L to 20L).toDF("y")
      a.crossJoin(b).count()
      a.join(b, col("x") === col("y")).count()
      // QueryExecutionListener delivery is async relative to the action
      val deadline = System.nanoTime() + 10_000_000_000L
      while (l.offenders.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val bad = l.offenders
      assert(bad.nonEmpty, "cross join not recorded")
      assert(bad.forall(_._2.exists(n =>
        n.startsWith("CartesianProduct") || n.startsWith("BroadcastNestedLoopJoin"))))
    } finally spark.listenerManager.unregister(l)
  }

  test("autoBinSize: next power of two above the mean interval length") {
    val iv = Seq((0L, 10L), (100L, 110L), (200L, 220L)).toDF("lo", "hi")
    // mean length 40/3 ≈ 13.3 → 16
    assert(RangeJoin.autoBinSize(iv, "lo", "hi") == 16L)
    val exact = Seq((0L, 4L), (10L, 14L)).toDF("lo", "hi") // mean 4 → 4
    assert(RangeJoin.autoBinSize(exact, "lo", "hi") == 4L)
    val empty = Seq.empty[(Long, Long)].toDF("lo", "hi")
    assert(RangeJoin.autoBinSize(empty, "lo", "hi") == 1L)
    val malformed = Seq((10L, 0L)).toDF("lo", "hi") // all ill-formed → 1
    assert(RangeJoin.autoBinSize(malformed, "lo", "hi") == 1L)
  }

  test("pointInInterval with autoBinSize equals the naive theta join") {
    val rnd = new scala.util.Random(21)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong(2000))).toDF("p_id", "p")
    val ivs = (1L to 120L).map { i =>
      val lo = rnd.nextLong(1900); (i, lo, lo + rnd.nextLong(120))
    }.toDF("i_id", "lo", "hi")
    val w = RangeJoin.autoBinSize(ivs, "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", w)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
