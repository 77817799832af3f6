package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Binned range join ≡ the naive θ-join (which Spark plans as a nested
  * loop), across boundaries, negative domains, and bin widths — plus the
  * plan audit that the binned form actually avoids
  * BroadcastNestedLoopJoin.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pointInInterval ≡ naive BETWEEN join (seeded sweep, negatives and boundaries)") {
    val rng = new scala.util.Random(11)
    // Domain straddles zero so floor-division vs truncation differences show.
    val points = (0 until 400)
      .map(i => (i.toLong, (rng.nextInt(2001) - 1000).toLong))
      .toDF("p_id", "p")
    val intervals = (0 until 60).map { i =>
      val lo = (rng.nextInt(2001) - 1000).toLong
      (1000L + i, lo, lo + rng.nextInt(120).toLong)
    }.toDF("i_id", "lo", "hi")

    val naive = points
      .join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("p_id", "i_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = RangeJoin
        .pointInInterval(points, intervals, "p", "lo", "hi", binSize = w)
        .select("p_id", "i_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sorted
      assert(binned.toSeq == naive.toSeq, s"binSize $w")
    }
    assert(naive.nonEmpty)
  }

  test("bins stay exact past 2^53 (double division would corrupt them)") {
    val base = (1L << 60)
    val points = Seq((1L, base + 5L), (2L, base + 105L), (3L, -base + 7L),
      (4L, Long.MinValue + 2L)).toDF("p_id", "p")
    val intervals = Seq(
      (10L, base + 0L, base + 50L), // contains p=base+5
      (11L, base + 100L, base + 120L), // contains p=base+105
      (12L, -base + 0L, -base + 50L), // contains p=-base+7
      (13L, Long.MinValue, Long.MinValue + 40L) // long-subtract here would overflow
    ).toDF("i_id", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, intervals, "p", "lo", "hi", binSize = 13L)
      .select("p_id", "i_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(got.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L)))
  }

  test("pointInInterval drops empty intervals instead of mis-joining them") {
    val points = Seq((1L, 5L)).toDF("p_id", "p")
    val intervals = Seq((10L, 8L, 2L)).toDF("i_id", "lo", "hi") // lo > hi
    assert(RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 4L).count() == 0)
  }

  test("intervalOverlap ≡ naive overlap join, duplicate-free by construction") {
    val rng = new scala.util.Random(13)
    def mk(idBase: Long, n: Int) = (0 until n).map { i =>
      val lo = (rng.nextInt(1200) - 600).toLong
      (idBase + i, lo, lo + rng.nextInt(200).toLong)
    }
    val l = mk(0L, 80).toDF("l_id", "l_lo", "l_hi")
    val r = mk(5000L, 80).toDF("r_id", "r_lo", "r_hi")
    val naive = l
      .join(r, $"l_lo" <= $"r_hi" && $"r_lo" <= $"l_hi")
      .select("l_id", "r_id")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    for (w <- Seq(16L, 128L, 3000L)) {
      val rows = RangeJoin
        .intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi", binSize = w)
        .select("l_id", "r_id")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      // spans many shared bins at small widths — still exactly one row per pair
      assert(rows.length == rows.distinct.length, s"binSize $w emitted duplicates")
      assert(rows.sorted.toSeq == naive.toSeq, s"binSize $w")
    }
    assert(naive.nonEmpty)
  }

  test("plan audit: binned form is a hash/broadcast join, naive range-only join is a nested loop") {
    val points = spark.range(100).select($"id".as("p_id"), ($"id" * 3).as("p"))
    val intervals = spark.range(20).select(
      $"id".as("i_id"), ($"id" * 15).as("lo"), ($"id" * 15 + 10).as("hi"))

    // sparkPlan, not executedPlan: AQE wraps the latter before execution
    def hasBnlj(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])

    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
    assert(hasBnlj(naive), "expected Spark's native plan to be a nested loop")

    val binned = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 16L)
    assert(!hasBnlj(binned), "binned range join must not fall back to a nested loop")
  }

  test("intervalOverlap malformed-interval contract: set semantics, not raw θ-join") {
    // [8,2] is empty AS A SET but satisfies the naive predicate against
    // [0,10] — the documented contract drops it; equivalently, the output
    // equals the θ-join over the WELL-FORMED subset of both inputs.
    val l = Seq((1L, 0L, 10L), (2L, 8L, 2L), (3L, 20L, 25L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((10L, 5L, 6L), (11L, 9L, 3L), (12L, 24L, 30L)).toDF("r_id", "r_lo", "r_hi")
    val wellFormed = (d: org.apache.spark.sql.DataFrame, lo: String, hi: String) =>
      d.filter(col(lo) <= col(hi))
    val expected = wellFormed(l, "l_lo", "l_hi")
      .join(wellFormed(r, "r_lo", "r_hi"), $"l_lo" <= $"r_hi" && $"r_lo" <= $"l_hi")
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    for (w <- Seq(2L, 7L, 64L)) {
      val got = RangeJoin
        .intervalOverlap(l, r, "l_lo", "l_hi", "r_lo", "r_hi", binSize = w)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq, s"binSize $w")
      // and the divergence from the raw θ-join is exactly the malformed rows
      assert(!got.contains((2L, 10L)) && !got.contains((1L, 11L)))
    }
  }
}
