package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** `dropDuplicatesWithinWatermark`: the BOUNDED-STATE streaming dedup —
  * unlike plain streaming dropDuplicates (whose key state grows forever),
  * a key is only held until the watermark passes its event time, which is
  * the only shape that survives an unbounded 100 TB/day stream when
  * duplicates are known to arrive close together (retries, at-least-once
  * upstreams). Cross-micro-batch duplicates within the window are
  * dropped; the first arrival wins.
  */
class StreamDropDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = 1672567200000000000L + min * 60000000000L

  test("cross-batch duplicates within the watermark window are dropped; first arrival wins") {
    val dir = Files.createTempDirectory("graft_ddw").toString
    def stage(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val scratch = s"$dir/scratch_$name"
      rows.toDF("event_id", "ts", "payload")
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/data"))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/data/$name.parquet"))
    }
    // batch a: original events (one internal duplicate of id 1)
    stage("a", Seq(
      (1L, ts(0), "first"),
      (1L, ts(2), "retry-same-batch"),
      (2L, ts(1), "only")))
    // batch b: a cross-batch retry of id 1 (within the 10-min window) and
    // a fresh id 3
    stage("b", Seq(
      (1L, ts(5), "retry-next-batch"),
      (3L, ts(6), "fresh")))

    val deduped = spark.readStream
      .schema("event_id long, ts long, payload string")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/data")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

    val name = s"ddw_${System.nanoTime()}"
    graft.streaming.StreamingOps.withStatePartitions(spark) {
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val got = spark.table(name).select("event_id", "payload")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "first"), (2L, "only"), (3L, "fresh")))
  }
}
