package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Raw-media ingestion through Spark's `binaryFile` source: loose files on
  * the lake become (doc_id, payload) binary rows that feed the existing
  * multimodal pipeline unchanged — the missing first leg of the
  * files-on-object-store → binary column → batched decode path.
  */
class BinaryIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("binaryFile source → media records → batched decode, with pushed size filter") {
    val dir = Files.createTempDirectory("graft_media").toString
    val payloads = Map(
      "clip_001.bin" -> Array.tabulate(300)(i => (i * 7 % 251).toByte),
      "clip_002.bin" -> Array.tabulate(50)(i => (i * 13 % 251).toByte),
      "clip_003.bin" -> Array.tabulate(1200)(i => (i * 3 % 251).toByte)
    )
    payloads.foreach { case (name, bytes) =>
      Files.write(Paths.get(dir, name), bytes)
    }

    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        // file identity → stable doc id (same idiom as Sampling.hashBucket)
        conv(substring(md5(regexp_extract(col("path"), "([^/]+)$", 1)), 1, 8), 16, 10)
          .cast("long").as("doc_id"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length"),
        col("content").as("payload"))

    // binaryFile supports a pushed length filter (skips oversized blobs
    // without reading their content — essential when a 100 TB media drop
    // has stray multi-GB files)
    val bounded = media.filter(col("length") <= 1000)
    assert(bounded.count() == 2)

    val meta = Multimodal.decodeMeta(bounded.select("doc_id", "payload"))
      .join(bounded.select("doc_id", "file_name"), "doc_id")
      .select("file_name", "n_bytes", "width", "height", "n_frames", "mean_byte")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))))
      .toMap

    // independent recomputation of the stub codec's arithmetic
    def expect(bytes: Array[Byte]) = {
      val n = bytes.length.toLong
      val first = bytes(0) & 0xff
      val mean = bytes.map(_ & 0xff).map(_.toLong).sum.toDouble / n
      (n, (64L + n % 577L).toInt, (64L + (n * 31L + first) % 353L).toInt,
        (1L + n % 7L).toInt, mean)
    }
    assert(meta("clip_001.bin") == expect(payloads("clip_001.bin")))
    assert(meta("clip_002.bin") == expect(payloads("clip_002.bin")))
    assert(!meta.contains("clip_003.bin"))
  }
}
