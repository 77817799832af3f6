package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeWriter

/** Z-order lake clustering: the interleave is a correct Morton code, and
  * the written layout bounds every file's min/max box on EVERY z column —
  * the property parquet/lake-format data skipping needs (a linear sort
  * only bounds the first column).
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; (v, c) <- xs.zipWithIndex)
      z |= ((v >> b) & 1L) << (b * xs.size + c)
    z
  }

  test("zValue matches the reference Morton interleave (2 and 3 dims)") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 200).map { _ =>
      (rng.nextInt(1 << 10).toLong, rng.nextInt(1 << 10).toLong, rng.nextInt(1 << 10).toLong)
    }
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(LakeWriter.zValue(Seq($"x", $"y"), 10).as("z")).collect().map(_.getLong(0))
    assert(got2.toSeq == rows.map(r => mortonRef(Seq(r._1, r._2), 10)))
    val got3 =
      df.select(LakeWriter.zValue(Seq($"x", $"y", $"w"), 10).as("z")).collect().map(_.getLong(0))
    assert(got3.toSeq == rows.map(r => mortonRef(Seq(r._1, r._2, r._3), 10)))
  }

  test("z-ordered layout bounds per-file min/max on BOTH dimensions; linear sort does not") {
    // full 64x64 grid — every cell once, so file bounding boxes are exact
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y")

    def fileSpans(path: String): Array[(Long, Long)] =
      spark.read
        .parquet(path)
        .groupBy(input_file_name())
        .agg(
          (max($"x") - min($"x")).as("sx"),
          (max($"y") - min($"y")).as("sy")
        )
        .collect()
        .map(r => (r.getAs[Long]("sx"), r.getAs[Long]("sy")))

    val zPath = Files.createTempDirectory("graft_zorder").toString
    LakeWriter.writeZOrdered(df, zPath, Seq("x", "y"), bits = 6, numFiles = 16)
    val zSpans = fileSpans(zPath)
    assert(zSpans.length >= 8, s"expected ~16 files, got ${zSpans.length}")
    // 16 contiguous chunks of the 4096-cell curve ≈ 16x16 tiles; range
    // boundaries come from sampling, so allow up to half the domain.
    assert(zSpans.forall { case (sx, sy) => sx <= 32 && sy <= 32 },
      s"z-order box too wide: ${zSpans.mkString(", ")}")

    val linPath = Files.createTempDirectory("graft_linear").toString
    df.repartitionByRange(16, $"x").sortWithinPartitions($"x").write
      .mode("overwrite").parquet(linPath)
    val linSpans = fileSpans(linPath)
    // linear sort on x leaves y unconstrained — full-span boxes
    assert(linSpans.forall { case (_, sy) => sy == 63 })
  }

  test("writeZOrdered survives empty input and all-NULL z columns (degenerate dimensions)") {
    // empty input: min/max aggregate yields NULLs — must degrade to a
    // no-op write, not an NPE on Row.getDouble
    val emptyPath = Files.createTempDirectory("graft_zorder_empty").toString
    LakeWriter.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("x", "y"), emptyPath, Seq("x", "y"), bits = 6)
    assert(spark.read.parquet(emptyPath).count() == 0)

    // one z column entirely NULL: that dimension degenerates to bucket 0,
    // the other still clusters; all rows survive the write
    val mixed = (0L until 256L).map(x => (x, Option.empty[Long])).toDF("x", "y")
    val mixedPath = Files.createTempDirectory("graft_zorder_null").toString
    LakeWriter.writeZOrdered(mixed, mixedPath, Seq("x", "y"), bits = 6, numFiles = 4)
    val back = spark.read.parquet(mixedPath)
    assert(back.count() == 256)
    assert(back.filter($"y".isNull).count() == 256)
  }
}
