package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeDeletes, LakeLog}

/** Merge-on-read deletion vectors: position pinning, accumulation,
  * idempotent re-delete, DV time travel, copy-on-write compaction.
  */
class LakeDeletesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_dv_$tag").resolve("t").toString

  test("deleteWhere removes exactly the matching rows, without rewriting data files") {
    val path = freshPath("basic")
    val df = (1L to 100L).toDF("id").withColumn("grp", col("id") % 3)
    LakeLog.overwrite(df.repartition(3), path)
    val filesBefore = LakeLog.listing(path, LakeLog.latestVersion(path).get).toSet
    LakeDeletes.deleteWhere(spark, path, col("id") > 90)
    // base log untouched: same version, same immutable files
    assert(LakeLog.listing(path, LakeLog.latestVersion(path).get).toSet == filesBefore)
    val live = LakeDeletes.readLive(spark, path)
    assert(live.count() == 90L)
    assert(live.agg(max(col("id"))).head.getLong(0) == 90L)
    assert(live.columns.toSeq == Seq("id", "grp"), "metadata helper columns must not leak")
  }

  test("deletes accumulate across commits and re-deleting is idempotent") {
    val path = freshPath("accum")
    LakeLog.overwrite((1L to 50L).toDF("id"), path)
    LakeDeletes.deleteWhere(spark, path, col("id") <= 10)
    LakeDeletes.deleteWhere(spark, path, col("id") > 45)
    LakeDeletes.deleteWhere(spark, path, col("id") <= 10) // duplicate positions
    assert(LakeDeletes.readLive(spark, path).count() == 35L)
    // DV time travel: reading the first DV version resurrects later deletes
    assert(LakeDeletes.readLive(spark, path, dvVersion = 1L).count() == 40L)
  }

  test("compact materializes live rows and resets the vector") {
    val path = freshPath("compact")
    LakeLog.overwrite((1L to 40L).toDF("id"), path)
    LakeDeletes.deleteWhere(spark, path, col("id") % 2 === 0)
    LakeDeletes.compact(spark, path)
    val live = LakeDeletes.readLive(spark, path)
    assert(live.count() == 20L)
    assert(live.as[Long].collect().forall(_ % 2 == 1))
    // post-compact deletes start from a clean vector on the new files
    LakeDeletes.deleteWhere(spark, path, col("id") === 1)
    assert(LakeDeletes.readLive(spark, path).count() == 19L)
  }
}
