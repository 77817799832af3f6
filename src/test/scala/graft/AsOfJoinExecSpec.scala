package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinExec

/** The first-class as-of physical operator ([[graft.plans.AsOfJoinExec]])
  * against its differential oracle, the composed union+running-last form
  * ([[AsOfJoin.asOf]]) — plus the plan-shape and null-semantics claims the
  * operator makes.
  */
class AsOfJoinExecSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = s"2024-01-$s 00:00:00"

  private def leftDf(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "t", "lid").select($"k", $"t".cast("timestamp").as("t"), $"lid")

  private def rightDf(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "t", "rid").select($"k", $"t".cast("timestamp").as("t"), $"rid")

  private def resultMap(df: DataFrame): Map[Long, Option[Long]] =
    df.collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[java.lang.Long]("last_rid")).map(_.longValue))
      .toMap

  test("semantics: <= visibility, tie-break last-wins, null when nothing precedes") {
    val left = leftDf((10L, ts("05"), 1L), (20L, ts("01"), 2L))
    val right = rightDf(
      (10L, ts("05"), 1L), // simultaneous: visible (<=)
      (10L, ts("05"), 2L), // tie-break: higher rid wins
      (10L, ts("06"), 3L), // future: invisible
      (20L, ts("02"), 4L)  // after left: invisible
    )
    val out = resultMap(
      AsOfJoin.asOfExec(left, right, "k", "k", "t", "t",
        Seq("rid" -> "last_rid"), rightTieBreak = Seq("rid"))
    )
    assert(out(1L).contains(2L))
    assert(out(2L).isEmpty)
  }

  test("null keys and null times never match; null-keyed left rows survive") {
    val left = Seq(
      (Some(10L), Some(ts("05")), 1L),
      (None, Some(ts("05")), 2L),      // null key → unmatched, row kept
      (Some(10L), None, 3L)            // null time → unmatched, row kept
    ).toDF("k", "t", "lid").select($"k", $"t".cast("timestamp").as("t"), $"lid")
    val right = Seq(
      (Some(10L), Some(ts("01")), 1L),
      (None, Some(ts("01")), 2L),      // null right key: never visible
      (Some(10L), None, 3L)            // null right time: never visible
    ).toDF("k", "t", "rid").select($"k", $"t".cast("timestamp").as("t"), $"rid")
    val out = resultMap(
      AsOfJoin.asOfExec(left, right, "k", "k", "t", "t", Seq("rid" -> "last_rid"))
    )
    assert(out(1L).contains(1L))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out.size == 3)
  }

  test("empty right side: all left rows emit with nulls") {
    val left = leftDf((10L, ts("05"), 1L), (20L, ts("01"), 2L))
    val right = rightDf().limit(0)
    val out = resultMap(
      AsOfJoin.asOfExec(left, right, "k", "k", "t", "t", Seq("rid" -> "last_rid"))
    )
    assert(out == Map(1L -> None, 2L -> None))
  }

  test("plan: AsOfJoinExec with one exchange per side and no global sort") {
    val left = leftDf((10L, ts("05"), 1L))
    val right = rightDf((10L, ts("01"), 1L))
    val df = AsOfJoin.asOfExec(left, right, "k", "k", "t", "t", Seq("rid" -> "last_rid"))
    df.collect()
    // AQE prints Final and Initial sections; audit the final plan only.
    val planStr = df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    // nodeName strips the Exec suffix: the operator prints as "AsOfJoin [keys…]".
    assert(planStr.contains("AsOfJoin ["), planStr)
    assert(!planStr.contains("SortMergeJoin") && !planStr.contains("NestedLoop"), planStr)
    // One ENSURE_REQUIREMENTS hash exchange per side, nothing more.
    assert(planStr.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, planStr)
    // Local sorts only — Sort prints as "Sort [orders], <global>, 0".
    assert(!planStr.contains("], true, 0"), planStr)
  }

  test("differential sweep: exec ≡ composed window form on random keyed histories") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 5) {
      val nKeys = 1 + rnd.nextInt(6)
      val lRows = Seq.tabulate(60) { i =>
        (rnd.nextInt(nKeys).toLong, ts(f"${1 + rnd.nextInt(28)}%02d"), i.toLong)
      }
      val rRows = Seq.tabulate(80) { i =>
        (rnd.nextInt(nKeys).toLong, ts(f"${1 + rnd.nextInt(28)}%02d"), i.toLong)
      }
      val left = leftDf(lRows: _*)
      val right = rightDf(rRows: _*)
      val viaExec = resultMap(
        AsOfJoin.asOfExec(left, right, "k", "k", "t", "t",
          Seq("rid" -> "last_rid"), rightTieBreak = Seq("rid")))
      val viaWindow = resultMap(
        AsOfJoin.asOf(left, right, "k", "k", "t", "t",
          Seq("rid" -> "last_rid"), rightTieBreak = Seq("rid")))
      assert(viaExec == viaWindow, s"round $round diverged")
    }
  }

  test("multiple value columns and key-type cast both carry through") {
    val left = Seq((10, ts("05"), 1L)).toDF("k", "t", "lid")
      .select($"k", $"t".cast("timestamp").as("t"), $"lid") // int key side
    val right = Seq((10L, ts("01"), 7L, "alpha")).toDF("k", "t", "rid", "tag")
      .select($"k", $"t".cast("timestamp").as("t"), $"rid", $"tag")
    val row = AsOfJoin
      .asOfExec(left, right, "k", "k", "t", "t",
        Seq("rid" -> "last_rid", "tag" -> "last_tag"))
      .collect()(0)
    assert(row.getAs[Long]("last_rid") == 7L)
    assert(row.getAs[String]("last_tag") == "alpha")
  }
}
