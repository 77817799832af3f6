package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftExtensions, RangeJoinRewrite}

/** The automatic Catalyst rewrite of range-only joins: plain
  * `df.join(other, p between lo and hi)` plans as a hash join once the
  * rule is installed and the bin-size conf is set, with identical
  * results; the rule stays inert without the conf and leaves equi-joins
  * alone.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.install(s)
    s
  }
  import spark.implicits._

  private def withBinSize[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinSizeConf, w.toString)
    try body
    finally spark.conf.unset(RangeJoinRewrite.BinSizeConf)
  }

  private def hasBnlj(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])

  private def pointsAndIntervals() = {
    val rng = new scala.util.Random(17)
    val points = (0 until 300)
      .map(i => (i.toLong, (rng.nextInt(2001) - 1000).toLong))
      .toDF("p_id", "p")
    val intervals = (0 until 50).map { i =>
      val lo = (rng.nextInt(2001) - 1000).toLong
      (1000L + i, lo, lo + rng.nextInt(90).toLong)
    }.toDF("i_id", "lo", "hi")
    (points, intervals)
  }

  test("rewrite fires: same rows as the nested-loop plan, but a hash join") {
    val (points, intervals) = pointsAndIntervals()
    def q() = points
      .join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("p_id", "i_id")

    val naive = q()
    assert(hasBnlj(naive), "without the conf the native plan is a nested loop")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    withBinSize(64L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten), "rewrite must remove the nested loop")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq)
      assert(rewritten.columns.toSeq == Seq("p_id", "i_id"), "schema must be unchanged")
    }
    assert(expected.nonEmpty)
  }

  test("rewrite handles a flipped join order (intervals on the left)") {
    val (points, intervals) = pointsAndIntervals()
    def q() = intervals
      .join(points, $"p" >= $"lo" && $"p" <= $"hi")
      .select("p_id", "i_id")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    withBinSize(32L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten))
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected.toSeq)
    }
  }

  test("rewrite covers date and timestamp domains (bin width in days / micros)") {
    val events = spark
      .range(200)
      .select($"id".as("e_id"),
        expr("timestamp_micros(cast(1672531200000000 + id * 3600000000 as long))").as("ts"))
    val windows = spark
      .range(12)
      .select($"id".as("w_id"),
        expr("timestamp_micros(cast(1672531200000000 + id * 57600000000 as long))").as("lo"),
        expr("timestamp_micros(cast(1672531200000000 + id * 57600000000 + 86400000000 as long))").as("hi"))
    def q() = events.join(windows, $"ts" >= $"lo" && $"ts" <= $"hi").select("e_id", "w_id")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    withBinSize(86400000000L) { // 1 day in micros
      val rewritten = q()
      assert(!hasBnlj(rewritten), "timestamp range join must rewrite")
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected.toSeq)
    }

    val dEvents = events.select($"e_id",
      date_add(lit(java.sql.Date.valueOf("2023-01-01")), ($"e_id" % 40).cast("int")).as("d"))
    val dWindows = spark.range(8).select(
      $"id".as("w_id"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")), ($"id" * 5).cast("int")).as("lo"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")), ($"id" * 5 + 6).cast("int")).as("hi"))
    def dq() = dEvents.join(dWindows, $"d" >= $"lo" && $"d" <= $"hi").select("e_id", "w_id")
    val dExpected = dq().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(dExpected.nonEmpty)
    withBinSize(7L) { // 7 days
      val rewritten = dq()
      assert(!hasBnlj(rewritten), "date range join must rewrite")
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == dExpected.toSeq)
    }
  }

  test("extra non-equi conjuncts ride along unchanged") {
    val (points, intervals) = pointsAndIntervals()
    val p2 = points.withColumn("flag", $"p_id" % 3)
    val i2 = intervals.withColumn("iflag", $"i_id" % 3)
    def q() = p2.join(i2, $"p" >= $"lo" && $"p" <= $"hi" && $"flag" =!= $"iflag")
      .select("p_id", "i_id")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    withBinSize(64L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten))
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected.toSeq)
    }
  }

  test("guard: joins that already have an equi-key are left alone") {
    val (points, intervals) = pointsAndIntervals()
    val p2 = points.withColumn("k", $"p_id" % 5)
    val i2 = intervals.withColumn("k", $"i_id" % 5)
    withBinSize(64L) {
      val j = p2.join(i2, p2("k") === i2("k") && $"p" >= $"lo" && $"p" <= $"hi")
      // already a hash join; the rewrite must not touch it (no bin columns)
      assert(!hasBnlj(j))
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }

  test("interval-OVERLAP θ-join rewrites to a binned hash join, duplicate-free") {
    val rng = new scala.util.Random(23)
    def ivals(n: Int, idBase: Long) = (0 until n).map { i =>
      val lo = (rng.nextInt(2001) - 1000).toLong
      (idBase + i, lo, lo + rng.nextInt(200).toLong)
    }.toDF("id", "lo", "hi")
    val a = ivals(120, 0).toDF("a_id", "a_lo", "a_hi")
    val b = ivals(80, 1000).toDF("b_id", "b_lo", "b_hi")
    def q() = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi").select("a_id", "b_id")

    val naive = q()
    assert(hasBnlj(naive), "overlap θ-join natively plans as a nested loop")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    withBinSize(128L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten), "overlap rewrite must remove the nested loop")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      // exact multiset equality: the first-shared-bin guard must emit each
      // overlapping pair exactly once, with no Distinct in the plan
      assert(got.toSeq == expected.toSeq)
      assert(!rewritten.queryExecution.optimizedPlan.toString.contains("Distinct"))
    }
  }

  test("overlap rewrite is total: malformed intervals keep θ-join semantics") {
    // [5,2] overlaps [0,10] under the naive predicate (5<=10 && 0<=2) —
    // the rewrite must preserve that, NOT apply set semantics (contrast
    // RangeJoin.intervalOverlap, which documents dropping such rows)
    val a = Seq((1L, 5L, 2L), (2L, 8L, 9L), (3L, -7L, -7L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 0L, 10L), (11L, 100L, 90L)).toDF("b_id", "b_lo", "b_hi")
    def q() = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi").select("a_id", "b_id")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    withBinSize(4L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten))
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected.toSeq)
    }
  }

  test("extreme long domain: bins near Long.MinValue don't overflow under ANSI") {
    // Raw long `x - pmod(x, w)` overflows for x within w of Long.MinValue —
    // under ANSI mode (Spark 4 default) that is a runtime crash, so the rule
    // must use the same decimal(38,0) floor-division as RangeJoin.binOf.
    val points = Seq(
      (1L, Long.MinValue),
      (2L, Long.MinValue + 2L),
      (3L, Long.MaxValue - 1L),
      (4L, 0L)
    ).toDF("p_id", "p")
    val intervals = Seq(
      (10L, Long.MinValue, Long.MinValue + 5L),
      (11L, Long.MaxValue - 10L, Long.MaxValue),
      (12L, -3L, 3L)
    ).toDF("i_id", "lo", "hi")
    def q() = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi").select("p_id", "i_id")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.toSeq == Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
    withBinSize(64L) {
      val rewritten = q()
      assert(!hasBnlj(rewritten), "extreme-domain range join must still rewrite")
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expected.toSeq)
    }
  }

  test("inert without the conf, and empty intervals never match") {
    val points = Seq((1L, 5L)).toDF("p_id", "p")
    val bad = Seq((10L, 8L, 2L)).toDF("i_id", "lo", "hi") // lo > hi
    val j = points.join(bad, $"p" >= $"lo" && $"p" <= $"hi")
    assert(hasBnlj(j), "no conf → no rewrite")
    assert(j.count() == 0)
    withBinSize(4L) {
      assert(j.count() == 0, "descending junk bins must be filtered by the predicate")
    }
  }
}
