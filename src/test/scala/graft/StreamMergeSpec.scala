package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeMerge

/** CDC apply via foreachBatch + MERGE: later micro-batches win, the
  * sequence column compacts multi-change batches to the latest version
  * per key, deletes flow through, and a re-drain on the same checkpoint
  * is a no-op (file source consumed everything).
  */
class StreamMergeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two CDC batches apply in order; within-batch latest-per-key wins; re-drain no-op") {
    val root = Files.createTempDirectory("graft_cdc").toString
    val table = s"$root/table"
    val changes = s"$root/changes"
    val checkpoint = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(changes))

    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "status", "v").write.partitionBy("status").parquet(table)

    def stage(name: String, rows: Seq[(Long, String, Double, Boolean, Long)]): Unit = {
      val scratch = s"$root/scratch_$name"
      rows.toDF("k", "status", "v", "is_delete", "seq")
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$changes/$name.parquet"))
    }
    // batch a: k2 updated twice in one batch (seq 5 then 9: 9 wins), k4 inserted
    stage("a", Seq(
      (2L, "a", 20.0, false, 5L),
      (2L, "a", 25.0, false, 9L),
      (4L, "b", 4.0, false, 6L)))
    // batch b (later): k2 re-updated (later batch beats batch a), k1 deleted
    stage("b", Seq(
      (2L, "b", 30.0, false, 11L),
      (1L, "a", 0.0, true, 12L)))

    def drain(): Unit = LakeMerge.streamMergeToLake(
      spark.readStream
        .schema("k long, status string, v double, is_delete boolean, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(changes),
      table,
      keyCols = Seq("k"),
      checkpoint = checkpoint,
      partitionCols = Seq("status"),
      deleteCol = Some("is_delete"),
      sequenceCol = Some("seq"))

    def snapshot(): Set[(Long, String, Double)] =
      spark.read.parquet(table).select("k", "status", "v")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    drain()
    val afterFirst = snapshot()
    assert(afterFirst == Set((2L, "b", 30.0), (3L, "b", 3.0), (4L, "b", 4.0)))

    // same checkpoint, no new files: nothing replays, table unchanged
    drain()
    assert(snapshot() == afterFirst)

    // a third batch arriving later is picked up incrementally
    stage("c", Seq((3L, "b", 0.0, true, 20L)))
    drain()
    assert(snapshot() == Set((2L, "b", 30.0), (4L, "b", 4.0)))
  }
}
