package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** The incremental MinHash-LSH near-dup pipeline: equal to the batch
  * q26 on a bounded replay, and genuinely incremental — a near-dup whose
  * two copies arrive in DIFFERENT micro-batches is still detected,
  * because bucket membership persists in GroupState.
  */
class StreamingNearDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bounded replay equals the batch minhash pipeline") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = StreamingNearDup
      .run(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = Dedup
      .minhashPairs(graft.sources.Tables.documents(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture should contain planted near-dups")
  }

  test("near-dup copies arriving in different micro-batches are detected") {
    val dir = Files.createTempDirectory("graft_neardup_in").toString
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val edited = base.replace(" w50 ", " zzz ")
    val unrelated = (0 until 100).map(i => s"x$i").mkString(" ")
    def writeBatch(rows: Seq[(Long, String)]): Unit = {
      rows
        .toDF("doc_id", "text")
        .select(
          col("doc_id"),
          col("text"),
          lit("en").as("lang"),
          lit("test").as("source"),
          length(col("text")).cast("long").as("n_chars")
        )
        .coalesce(1)
        .write
        .mode("append")
        .parquet(dir)
      Thread.sleep(1200) // distinct mtimes → one micro-batch per file
    }
    writeBatch(Seq(1L -> base, 3L -> unrelated))
    writeBatch(Seq(2L -> edited))

    val stream = spark.readStream
      .schema("doc_id long, text string, lang string, source string, n_chars long")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val name = "neardup_increments"
    val q = StreamingNearDup
      .candidatePairs(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start() // default micro-batch trigger: one batch per file
    try q.processAllAvailable()
    finally q.stop()

    assert(
      q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected the two files to arrive as separate micro-batches"
    )
    val pairs = spark
      .table(name)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)), s"cross-batch near-dup not detected: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), s"false candidate: $pairs")
  }
}
