package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulCounter

/** Event-time timers in transformWithState: a user with no events for
  * `gap` produces one WentQuiet emission carrying their true last-seen
  * time; a new event re-arms the timer, so an active user only goes
  * quiet relative to their LATEST event. Output triggered by ABSENCE of
  * input — the shape windowed aggregation can't express.
  */
class QuietTimerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = 1672567200000000000L + min.toLong * 60000000000L

  test("inactivity timers fire per user with the latest last-seen; re-armed by activity") {
    val dir = Files.createTempDirectory("graft_quiet").toString
    def stage(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val scratch = s"$dir/scratch_$name"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/data"))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/data/$name.parquet"))
    }
    // batch a: user 7 active twice; user 8 once
    stage("a", Seq(
      (1L, ts(0), 7L, "view", 0.0, "{}"),
      (2L, ts(5), 7L, "view", 0.0, "{}"),
      (3L, ts(0), 8L, "view", 0.0, "{}")))
    // batch b: user 8 returns at t40 (re-arms their timer past t30);
    // far-future sentinel pushes the watermark so every timer expires
    stage("b", Seq(
      (4L, ts(40), 8L, "view", 0.0, "{}"),
      (9L, 7258118400000000000L, -1L, "sentinel", 0.0, "{}")))

    val stream = spark.readStream
      .schema("event_id long, ts long, user_id long, event_type string, value double, props string")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"quiet_${System.nanoTime()}"
    try {
      graft.streaming.StreamingOps.withStatePartitions(spark) {
        val q = StatefulCounter.quietUsers(stream, gapUs = 30L * 60000000L)
          .writeStream.outputMode("append").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable()
        finally q.stop()
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))

    val got = spark.table(name)
      .filter($"user_id" =!= -1L)
      .select("user_id", "last_seen_us")
      .as[(Long, Long)].collect()
    // exactly ONE quiet emission per user, carrying their latest event
    assert(got.length == 2, s"got ${got.toSeq}")
    assert(got.toSet == Set((7L, ts(5) / 1000), (8L, ts(40) / 1000)))
  }
}
