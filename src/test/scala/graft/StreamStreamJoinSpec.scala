package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The stream-stream attribution join: matches equal the batch θ-join,
  * matches arriving in DIFFERENT micro-batches are still found (the whole
  * point of buffered two-sided state), and the physical plan is a real
  * symmetric hash join with watermark-bounded state — not a batch join in
  * disguise.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 10:$min%02d:00")

  test("cross-micro-batch matches: click and purchase in separate files both match") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    // file 1: clicks only; file 2 (a later micro-batch under AvailableNow
    // with maxFilesPerTrigger=1): the purchases
    Seq((1L, ts(0), 7L, "click", 0.0, "{}"), (2L, ts(5), 8L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq(
      (10L, ts(20), 7L, "purchase", 9.5, "{}"), // 20 min after click: match
      (11L, ts(50), 8L, "purchase", 1.0, "{}"), // 45 min after click: no match
      (12L, ts(21), 9L, "purchase", 2.0, "{}") // user with no click: no match
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/f2")

    def sideStream(sub: String, typ: String) =
      spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/$sub")
        .filter(col("event_type") === typ)

    val joined = StreamingOps.clickPurchaseAttribution(
      sideStream("f1", "click"), sideStream("f2", "purchase"))
    val name = s"ssj_${System.nanoTime()}"
    StreamingOps.withStatePartitions(spark) {
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val got = spark.table(name)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("bounded replay equals the batch θ-join, and the plan is a streaming symmetric hash join") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.runClickPurchaseAttribution(spark, sfDir)
    val e = graft.sources.Tables.events(spark, sfDir)
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("cts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
    val batch = c.join(p,
        $"user_id" === $"pu" && $"pts" >= $"cts" &&
          $"pts" <= $"cts" + expr("INTERVAL 30 MINUTES"))
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    val got = streamed.select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == batch)
    assert(batch.nonEmpty)

    // plan audit: a genuine two-sided stateful join operator
    val joined = StreamingOps.clickPurchaseAttribution(
      StreamingOps.eventsStream(spark, sfDir).filter($"event_type" === "click"),
      StreamingOps.eventsStream(spark, sfDir).filter($"event_type" === "purchase"))
    val name = s"ssj_plan_${System.nanoTime()}"
    StreamingOps.withStatePartitions(spark) {
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try {
        q.processAllAvailable()
        val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan
        assert(exec.exists(_.isInstanceOf[StreamingSymmetricHashJoinExec]),
          s"expected StreamingSymmetricHashJoinExec in:\n$exec")
      } finally q.stop()
    }
  }

  test("left outer: unmatched clicks emit exactly once with nulls, after the watermark proof") {
    val dir = Files.createTempDirectory("graft_ssj_lo").toString
    // f1: two clicks; f2 (later micro-batch): one matching purchase, plus a
    // far-future sentinel pair that pushes both watermarks so the
    // unmatched click's null row can actually emit on the bounded replay
    Seq((1L, ts(0), 7L, "click", 0.0, "{}"), (2L, ts(5), 8L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // distinct mtimes: the file source orders batches by them
    val far = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    Seq(
      (10L, ts(20), 7L, "purchase", 9.5, "{}"), // matches click 1
      (-1L, far, -1L, "click", 0.0, "{}"),
      (-2L, far, -1L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

    def sideStream(typ: String) =
      spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .filter(col("event_type") === typ)

    val joined = StreamingOps.clickPurchaseAttributionLeftOuter(
      sideStream("click"), sideStream("purchase"))
    val name = s"ssj_lo_${System.nanoTime()}"
    StreamingOps.withStatePartitions(spark) {
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val got = spark.table(name).filter(col("user_id") =!= -1L)
      .select("click_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toSet
    // click 1 matched (and must NOT also emit a null row); click 2 unmatched
    assert(got == Set((1L, Some(10L)), (2L, None)))
  }
}
