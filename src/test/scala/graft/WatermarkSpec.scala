package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark + late-data semantics across real micro-batches: a file
  * source fed one file per trigger, append output mode — a window emits
  * exactly once, after the watermark passes it; a row arriving behind the
  * watermark once its window has closed is dropped (and counted by the
  * state operator), never re-opening the window.
  */
class WatermarkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("append-mode windows finalize once; late rows behind a closed window are dropped") {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    // One flat directory, one part-file per "arrival batch" (distinct
    // mtimes) so maxFilesPerTrigger=1 gives one micro-batch per file.
    def writeBatch(rows: Seq[(java.sql.Timestamp, String, Double)]): Unit = {
      rows
        .toDF("ts", "event_type", "value")
        .coalesce(1)
        .write
        .mode("append")
        .parquet(dir)
      Thread.sleep(1200)
    }
    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

    // File 1: windows [00:00) (two rows) and [00:20); max 00:21.
    writeBatch(Seq((ts(1), "a", 1.0), (ts(5), "a", 2.0), (ts(21), "a", 3.0)))
    // File 2: 00:35 pushes the event-time high mark to 00:35 ⇒ the 10-min
    // watermark eventually passes [00:00)'s end and closes it.
    writeBatch(Seq((ts(35), "a", 4.0)))
    // File 3: a straggler at 00:02 — behind the watermark, its window is
    // closed ⇒ must be dropped, not merged, and must not re-emit [00:00).
    writeBatch(Seq((ts(2), "a", 100.0)))

    val stream = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(date_format($"window.start", "HH:mm").as("w"), $"n", $"v")

    val name = "wm_out"
    // Default micro-batch trigger (AvailableNow prefetches one combined
    // plan here and defeats the per-file batching).
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    assert(
      q.recentProgress.count(_.numInputRows > 0) >= 3,
      "expected one micro-batch per file"
    )
    val dropped = q.recentProgress
      .flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark)
      .sum
    assert(dropped >= 1, "the straggler should be counted as dropped by the watermark")

    val out = spark
      .table(name)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // [00:00) finalized exactly once, with only its on-time rows.
    assert(out.get("00:00").contains((2L, 3.0)), s"got $out")
    // [00:20) and [00:30) are still open at the final watermark — append
    // mode has not emitted them.
    assert(!out.contains("00:20") && !out.contains("00:30"), s"got $out")
  }
}
