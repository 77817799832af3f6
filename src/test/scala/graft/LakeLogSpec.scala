package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeLog

/** The snapshot-versioned lake table: append/overwrite create readable
  * versions, time travel reads exact historical snapshots, losing an
  * overwrite race is a surfaced conflict (never silent clobber), and
  * vacuum deletes only unreferenced files.
  */
class LakeLogSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_lakelog").resolve("t").toString

  test("append chain: every version reads its exact snapshot") {
    val path = tmp()
    val v1 = LakeLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    val v2 = LakeLog.append(Seq((3L, "c")).toDF("id", "s"), path)
    val v3 = LakeLog.append(Seq((4L, "d")).toDF("id", "s"), path)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    def ids(v: Long) = LakeLog.read(spark, path, v).select("id").as[Long].collect().toSet
    assert(ids(1) == Set(1L, 2L))
    assert(ids(2) == Set(1L, 2L, 3L))
    assert(ids(3) == Set(1L, 2L, 3L, 4L))
    // latest == v3
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == ids(3))
    assert(LakeLog.versions(path) == Seq(1L, 2L, 3L))
  }

  test("overwrite starts a new lineage; old snapshots stay readable (time travel)") {
    val path = tmp()
    LakeLog.overwrite(Seq((1L, "a")).toDF("id", "s"), path)
    LakeLog.append(Seq((2L, "b")).toDF("id", "s"), path)
    val v3 = LakeLog.overwrite(Seq((9L, "z")).toDF("id", "s"), path)
    assert(v3 == 3L)
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(9L))
    assert(LakeLog.read(spark, path, 2L).select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("staged-but-uncommitted files are invisible to readers and vacuumable") {
    val path = tmp()
    LakeLog.overwrite(Seq((1L, "a")).toDF("id", "s"), path)
    // simulate a failed writer: orphan parquet dropped straight into data/
    val orphanSrc = Files.createTempDirectory("graft_orphan")
    Seq((99L, "junk")).toDF("id", "s").coalesce(1).write.mode("overwrite")
      .parquet(orphanSrc.toString)
    val part = Files.list(orphanSrc).iterator()
    var moved = 0
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        Files.copy(p, java.nio.file.Paths.get(path, "data", s"orphan-${p.getFileName}"))
        moved += 1
      }
    }
    assert(moved > 0)
    // invisible to the snapshot read
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L))
    // vacuum removes exactly the orphans
    val deleted = LakeLog.vacuum(path)
    assert(deleted.nonEmpty && deleted.forall(_.startsWith("orphan-")))
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L))
  }

  test("optimistic overwrite: losing the race is a surfaced conflict, never a clobber") {
    val path = tmp()
    LakeLog.overwrite(Seq((1L, "a")).toDF("id", "s"), path)
    // a concurrent writer publishes v2 between our read (latest=1) and commit
    val winner = java.nio.file.Paths.get(path, "_graft_log", f"${2L}%011d.json")
    Files.write(winner, """{ "version": 2, "files": [] }""".getBytes)
    intercept[LakeLog.CommitConflictException] {
      LakeLog.overwrite(Seq((7L, "x")).toDF("id", "s"), path, expectedLatest = Some(1L))
    }
    // the winner's (empty) snapshot is intact, our staged files are orphans
    assert(LakeLog.read(spark, path, 2L).count() == 0L)
    assert(LakeLog.vacuum(path).nonEmpty)
    // an append in the same situation rebases onto the winner instead
    val v = LakeLog.append(Seq((8L, "y")).toDF("id", "s"), path)
    assert(v == 3L)
    assert(LakeLog.read(spark, path, 3L).select("id").as[Long].collect().toSet == Set(8L))
  }

  test("origin-tagged appends are exactly-once; duplicate origins are skipped") {
    val path = tmp()
    LakeLog.overwrite(Seq((1L, "a")).toDF("id", "s"), path)
    assert(LakeLog.appendIfAbsent(Seq((2L, "b")).toDF("id", "s"), path, "batch-0") == Some(2L))
    // redelivery of the same batch (at-least-once producer): no-op
    assert(LakeLog.appendIfAbsent(Seq((2L, "b")).toDF("id", "s"), path, "batch-0").isEmpty)
    assert(LakeLog.appendIfAbsent(Seq((3L, "c")).toDF("id", "s"), path, "batch-1") == Some(3L))
    assert(LakeLog.versions(path) == Seq(1L, 2L, 3L))
    assert(LakeLog.origins(path) == Set("batch-0", "batch-1"))
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("streaming ingest into the versioned table: re-drain and checkpoint loss add nothing") {
    val src = Files.createTempDirectory("graft_lakelog_src").toString
    val path = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(src)
    def drain(checkpoint: String): Unit = {
      val stream = spark.readStream.schema("id long, s string").parquet(src)
      graft.streaming.StreamingOps.streamToVersionedLake(stream, path, checkpoint)
    }
    val ckpt1 = Files.createTempDirectory("graft_lakelog_ck").toString
    drain(ckpt1)
    val v1 = LakeLog.latestVersion(path).get
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L, 2L))
    // same checkpoint re-drain: source says nothing new — no new version
    drain(ckpt1)
    assert(LakeLog.latestVersion(path).get == v1)
    // checkpoint WIPED: the file source replays batch 0, but the table's
    // origin ledger skips it — still exactly-once at the table
    drain(Files.createTempDirectory("graft_lakelog_ck2").toString)
    assert(LakeLog.latestVersion(path).get == v1)
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L, 2L))
    // genuinely new data under the original checkpoint lands as one commit
    Seq((3L, "c")).toDF("id", "s").coalesce(1).write.mode("append").parquet(src)
    drain(ckpt1)
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("manifest stats prune files at read time; results stay exact") {
    val path = tmp()
    // three appends with disjoint id ranges → three files with tight
    // footer ranges recorded in the sidecars
    LakeLog.overwrite(
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      path, statsCols = Seq("id"))
    LakeLog.append(
      (101L to 200L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      path, statsCols = Seq("id"))
    LakeLog.append(
      (201L to 300L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      path, statsCols = Seq("id"))
    val v = LakeLog.latestVersion(path).get
    assert(LakeLog.fileStats(path, v, "id").size == 3)
    // a range inside the middle file opens ONE file, not three
    val pruned = LakeLog.readPruned(spark, path, "id", 120, 180)
    assert(pruned.inputFiles.length == 1, pruned.inputFiles.mkString(","))
    assert(pruned.filter($"id".between(120, 180)).count() == 61L)
    // pruning is file-granular: the caller's row filter still applies,
    // and the filtered result equals the unpruned read's
    val full = LakeLog.read(spark, path).filter($"id".between(120, 180))
      .select("id").as[Long].collect().toSet
    val got = pruned.filter($"id".between(120, 180))
      .select("id").as[Long].collect().toSet
    assert(got == full)
    // a range beyond every file reads nothing but keeps the schema
    assert(LakeLog.readPruned(spark, path, "id", 1000, 2000).count() == 0L)
    // a column with no recorded stats keeps every file (correctness first)
    assert(LakeLog.readPruned(spark, path, "nope", 0, 1).inputFiles.length == 3)
  }

  test("truncateLog + vacuum reclaims files no retained snapshot references") {
    val path = tmp()
    LakeLog.overwrite(Seq((1L, "a")).toDF("id", "s"), path) // v1
    LakeLog.overwrite(Seq((2L, "b")).toDF("id", "s"), path) // v2: v1's files now only in v1
    LakeLog.truncateLog(path, keep = 1)
    assert(LakeLog.versions(path) == Seq(2L))
    val deleted = LakeLog.vacuum(path)
    assert(deleted.nonEmpty, "v1-only files should be reclaimed")
    assert(LakeLog.read(spark, path).select("id").as[Long].collect().toSet == Set(2L))
  }
}
