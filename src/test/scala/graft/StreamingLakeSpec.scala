package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Checkpointed parquet lake ingest: each drain consumes only the files
  * that arrived since the last one, re-draining with no new input adds
  * nothing, and the output lands partitioned.
  */
class StreamingLakeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeBatch(srcDir: Path, name: String, ids: Range): Unit = {
    val df = ids
      .map(i => (i.toLong, s"doc number $i body", if (i % 2 == 0) "en" else "de", "synth", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // one parquet FILE per batch dir entry, atomically moved into place so
    // the file-stream source never lists a half-written file
    val tmp = Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, srcDir.resolve(name))
  }

  test("incremental drains are exactly-once: no reprocessing, only new files ingested") {
    val src = Files.createTempDirectory("graft_lake_src")
    val out = Files.createTempDirectory("graft_lake_out").resolve("table").toString
    val ckpt = Files.createTempDirectory("graft_lake_ckpt").toString

    def drain(): Unit = StreamingOps.streamToLake(
      StreamingOps.documentsStream(spark, src.toString)
        .withColumn("doc_len", length(col("text"))),
      out,
      ckpt,
      partitionCols = Seq("lang")
    )

    writeBatch(src, "documents.parquet", 0 until 100)
    drain()
    assert(spark.read.parquet(out).count() == 100)

    drain() // nothing new arrived
    assert(spark.read.parquet(out).count() == 100, "re-drain must not duplicate")

    writeBatch(src, "documents_2.parquet", 100 until 150)
    drain()
    val after = spark.read.parquet(out)
    assert(after.count() == 150)
    assert(after.select(sum($"doc_id")).head().getLong(0) == (0L until 150L).sum,
      "every row exactly once")
    // transform applied and partition layout real
    assert(after.schema.fieldNames.contains("doc_len"))
    assert(Files.list(java.nio.file.Paths.get(out)).anyMatch(_.getFileName.toString == "lang=en"))
  }
}
