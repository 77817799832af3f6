package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeMerge

/** MERGE INTO semantics over a plain parquet lake table: upsert, insert,
  * delete, cross-partition moves, emptied-partition removal — and the
  * scale property that untouched partitions' files are not rewritten.
  */
class LakeMergeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_merge").resolve("t").toString

  private def rowsOf(df: DataFrame): Set[(Long, String, Double)] =
    df.select("k", "status", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("unpartitioned: update + insert + delete in one merge") {
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "status", "v").write.parquet(path)
    val updates = Seq(
      (2L, "a", 20.0, false), // update
      (4L, "b", 4.0, false), // insert
      (3L, "b", 0.0, true) // delete
    ).toDF("k", "status", "v", "is_delete")
    LakeMerge.mergeInto(spark, path, updates, Seq("k"), deleteCol = Some("is_delete"))
    assert(rowsOf(spark.read.parquet(path)) ==
      Set((1L, "a", 1.0), (2L, "a", 20.0), (4L, "b", 4.0)))
  }

  test("partitioned: cross-partition move, emptied partition removed, untouched files intact") {
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "c", 4.0))
      .toDF("k", "status", "v")
      .write.partitionBy("status").parquet(path)

    def files(part: String): Set[String] = {
      val d = new java.io.File(s"$path/status=$part")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val aFilesBefore = files("a")
    assert(aFilesBefore.nonEmpty)

    val updates = Seq(
      (2L, "c", 20.0, false), // moves b -> c; partition b becomes empty
      (5L, "d", 5.0, false), // insert into brand-new partition d
      (4L, "c", 0.0, true) // delete in c
    ).toDF("k", "status", "v", "is_delete")
    LakeMerge.mergeInto(spark, path, updates, Seq("k"),
      partitionCols = Seq("status"), deleteCol = Some("is_delete"))

    assert(rowsOf(spark.read.parquet(path)) ==
      Set((1L, "a", 1.0), (2L, "c", 20.0), (3L, "c", 3.0), (5L, "d", 5.0)))
    // the emptied source partition is gone entirely
    assert(files("b").isEmpty)
    assert(!new java.io.File(s"$path/status=b").exists())
    // untouched partition a: same physical files, byte-for-byte no rewrite
    assert(files("a") == aFilesBefore)
  }

  test("merge with no matching partitions still inserts; second merge is idempotent on keys") {
    val path = tmp()
    Seq((1L, "a", 1.0)).toDF("k", "status", "v")
      .write.partitionBy("status").parquet(path)
    val ins = Seq((2L, "z", 2.0)).toDF("k", "status", "v")
    LakeMerge.mergeInto(spark, path, ins, Seq("k"), partitionCols = Seq("status"))
    LakeMerge.mergeInto(spark, path, ins, Seq("k"), partitionCols = Seq("status"))
    assert(rowsOf(spark.read.parquet(path)) == Set((1L, "a", 1.0), (2L, "z", 2.0)))
  }

  test("all-deletes merge: empty merged slice, every touched partition directory removed") {
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "status", "v").write.partitionBy("status").parquet(path)
    val deletes = Seq((1L, "a", 0.0, true), (2L, "a", 0.0, true))
      .toDF("k", "status", "v", "is_delete")
    LakeMerge.mergeInto(spark, path, deletes, Seq("k"),
      partitionCols = Seq("status"), deleteCol = Some("is_delete"))
    assert(!new java.io.File(s"$path/status=a").exists(), "emptied partition a not removed")
    assert(rowsOf(spark.read.parquet(path)) == Set((3L, "b", 3.0)))
    // no staging debris left behind
    val parent = new java.io.File(path).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("__merge_staging")),
      "staging dir not cleaned up")
  }

  test("property sweep: random merge sequences equal an in-memory keyed fold") {
    val rng = new scala.util.Random(43)
    val statuses = Array("a", "b", "c")
    for (trial <- 1 to 3) {
      val path = tmp()
      // seed table
      var model = (0L until 40L)
        .map(k => k -> ((statuses(rng.nextInt(3)), rng.nextInt(1000) / 10.0)))
        .toMap
      model.toSeq.map { case (k, (st, v)) => (k, st, v) }
        .toDF("k", "status", "v")
        .write.partitionBy("status").parquet(path)
      // several random CDC batches: upserts (possibly moving partition),
      // inserts of new keys, deletes of existing and absent keys
      for (_ <- 1 to 4) {
        val ops = (1 to 12).map { _ =>
          val k = rng.nextInt(60).toLong // may or may not exist
          val del = rng.nextInt(4) == 0
          (k, statuses(rng.nextInt(3)), rng.nextInt(1000) / 10.0, del)
        }
        // one winner per key within the batch (merge precondition):
        // keep the LAST op for duplicated keys, like a compacted CDC batch
        val compacted = ops.groupBy(_._1).map(_._2.last).toSeq
        LakeMerge.mergeInto(spark, path,
          compacted.toDF("k", "status", "v", "is_delete"),
          keyCols = Seq("k"), partitionCols = Seq("status"),
          deleteCol = Some("is_delete"))
        compacted.foreach { case (k, st, v, del) =>
          model = if (del) model - k else model + (k -> ((st, v)))
        }
      }
      val got = rowsOf(spark.read.parquet(path))
      val want = model.map { case (k, (st, v)) => (k, st, v) }.toSet
      assert(got == want, s"trial $trial diverged: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("compact collapses small files per partition without changing content") {
    val path = tmp()
    val df = spark.range(200)
      .select($"id".as("k"),
        (when($"id" % 2 === 0, "even").otherwise("odd")).as("status"),
        ($"id" * 1.5).as("v"))
    // fragment: 8 writer tasks per partition directory
    df.repartition(8).write.partitionBy("status").parquet(path)
    def fileCount(part: String): Int =
      new java.io.File(s"$path/status=$part")
        .listFiles().count(_.getName.endsWith(".parquet"))
    assert(fileCount("even") > 1)
    val before = rowsOf(spark.read.parquet(path))
    LakeMerge.compact(spark, path, partitionCols = Seq("status"))
    assert(fileCount("even") == 1 && fileCount("odd") == 1)
    assert(rowsOf(spark.read.parquet(path)) == before)
  }

  test("compact unpartitioned to a target file count") {
    val path = tmp()
    spark.range(100).select($"id".as("k"), lit("x").as("status"), ($"id" * 1.0).as("v"))
      .repartition(16).write.parquet(path)
    val before = rowsOf(spark.read.parquet(path))
    LakeMerge.compact(spark, path, numFiles = 2)
    val n = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(n == 2)
    assert(rowsOf(spark.read.parquet(path)) == before)
  }

  test("schema evolution: new source column lands; survivors read null; target-only kept on update, null on insert") {
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("k", "status", "v").write.parquet(path)
    // updates add `tag`, and OMIT the table column `v`
    val updates = Seq((2L, "a", "hot"), (3L, "b", "new")).toDF("k", "status", "tag")
    LakeMerge.mergeInto(spark, path, updates, Seq("k"), evolveSchema = true)
    val out = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> ((Option(r.getAs[java.lang.Double]("v")).map(_.doubleValue),
        Option(r.getAs[String]("tag"))))).toMap
    assert(out(1L) == ((Some(1.0), None)))      // untouched: v kept, tag null
    assert(out(2L) == ((Some(2.0), Some("hot")))) // updated: v PRESERVED, tag set
    assert(out(3L) == ((None, Some("new"))))    // inserted: v null, tag set
  }

  test("schema evolution, partitioned: untouched partition keeps old files; mergeSchema read sees nulls; compact normalizes") {
    val path = tmp()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "status", "v")
      .write.partitionBy("status").parquet(path)
    def files(part: String): Set[String] = {
      val d = new java.io.File(s"$path/status=$part")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val aBefore = files("a")

    val updates = Seq((2L, "b", 20.0, "hot"), (3L, "b", 3.0, "warm"))
      .toDF("k", "status", "v", "tag")
    LakeMerge.mergeInto(spark, path, updates, Seq("k"),
      partitionCols = Seq("status"), evolveSchema = true)

    // the untouched partition was not rewritten — its files predate `tag`
    assert(files("a") == aBefore)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    val out = merged.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(merged.columns.indexOf("v")),
        Option(r.getAs[String]("tag"))))).toMap
    assert(out == Map(
      1L -> ((1.0, None)), 2L -> ((20.0, Some("hot"))), 3L -> ((3.0, Some("warm")))))

    // compact rewrites every file to the union schema: a PLAIN read (no
    // mergeSchema) must now surface `tag` everywhere
    LakeMerge.compact(spark, path, partitionCols = Seq("status"))
    val plain = spark.read.parquet(path)
    assert(plain.columns.contains("tag"))
    assert(plain.count() == 3)
  }

  test("schema evolution: overlapping column cast to the table's type, not drifted") {
    val path = tmp()
    Seq((1L, "a", 1.0)).toDF("k", "status", "v").write.parquet(path)
    // v arrives as Int — must come out Double (the table's type)
    val updates = Seq((2, "a", 7)).toDF("k", "status", "v")
      .select($"k".cast("long").as("k"), $"status", $"v")
    LakeMerge.mergeInto(spark, path, updates, Seq("k"), evolveSchema = true)
    val df = spark.read.parquet(path)
    assert(df.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(rowsOf(df) == Set((1L, "a", 1.0), (2L, "a", 7.0)))
  }
}
