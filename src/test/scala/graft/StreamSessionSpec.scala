package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming session windows: sessions spanning micro-batches MERGE in
  * state, the sentinel-flushed bounded drain equals the batch
  * session_window result, and append mode without the sentinel really
  * does pin trailing sessions (the reason the sentinel exists).
  */
class StreamSessionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = 1672567200000000000L + min * 60000000000L // 2023-01-01T10:00Z + min

  private def drain(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val name = s"sess_spec_${System.nanoTime()}"
    StreamingOps.withStatePartitions(spark) {
      val q = df.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
  }

  test("a session split across micro-batches merges; distinct sessions don't") {
    val dir = Files.createTempDirectory("graft_sess").toString
    // the file stream source lists FLAT files under the path — stage each
    // micro-batch's rows as a single part file moved up to data/<name>
    def stage(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val scratch = s"$dir/scratch_$name"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/data"))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/data/$name.parquet"))
    }
    // batch 1: two events 10 min apart for user 7
    stage("a", Seq((1L, ts(0), 7L, "view", 1.0, "{}"), (2L, ts(10), 7L, "view", 2.0, "{}")))
    // batch 2: 20 min later (within gap: merges), then a 40-min silence
    // and one more (new session), plus the flush sentinel
    stage("b", Seq(
      (3L, ts(30), 7L, "view", 3.0, "{}"),
      (4L, ts(70), 7L, "view", 4.0, "{}"),
      (9L, ts(10000), -1L, "sentinel", 0.0, "{}")))

    val stream = spark.readStream
      .schema("event_id long, ts long, user_id long, event_type string, value double, props string")
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", false)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val got = drain(StreamingOps.sessionAgg(stream))
      .filter($"user_id" =!= -1L)
      .select("user_id", "session_start_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    // one merged session 0..30 min (events 1,2,3), one later session at 70
    assert(got == Set(
      (7L, ts(0) / 1000, 3L, 6.0),
      (7L, ts(70) / 1000, 1L, 4.0)))
  }

  test("bounded replay with sentinel flush equals the batch session_window result") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.runStreamingSessionAgg(spark, sfDir)
      .select("user_id", "session_start_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select($"user_id", unix_micros($"session_window.start").as("session_start_us"),
        $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
