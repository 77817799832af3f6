package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeWriter

/** Parquet bloom filters land in the written files for exactly the
  * requested columns — the point-lookup skipping mechanism for
  * id-shaped probe columns whose min/max stats span the whole domain in
  * every row group.
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom filter present for the requested column only; content round-trips") {
    val dir = Files.createTempDirectory("graft_bloom").resolve("t").toString
    val df = spark.range(5000).select(
      ($"id" % 4).cast("int").as("part"),
      $"id".as("ts_like"),
      // high-cardinality scrambled id: min/max stats are useless for
      // point probes on it, the bloom filter is not
      xxhash64($"id").as("probe_id"),
      concat(lit("v"), $"id").as("payload"))
    LakeWriter.writePartitioned(df, dir, Seq("part"),
      sortCols = Seq("ts_like"), bloomFilterCols = Seq("probe_id"))

    val part = new java.io.File(s"$dir/part=0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.toString), new Configuration()))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size()).map(cols.get)
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("probe_id").getBloomFilterOffset > 0,
        "no bloom filter on the requested column")
      assert(byName("payload").getBloomFilterOffset == -1,
        "bloom filter written for a column that didn't ask for one")
    } finally reader.close()

    // layout change is metadata-only: content identical
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(sum($"ts_like")).head().getLong(0) == (0L until 5000L).sum)
  }
}
