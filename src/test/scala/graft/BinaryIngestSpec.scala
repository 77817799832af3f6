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

  /** An in-memory PNG with a deterministic gradient: pixel (x,y) has
    * r=g=b=(x*7+y*13)%256, so mean luminance is computable exactly.
    */
  private def pngBytes(w: Int, h: Int): (Array[Byte], Double) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13) % 256
      sum += v
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    (bos.toByteArray, sum.toDouble / (w * h))
  }

  test("real PNG round-trip: ImageIoCodec decodes true dimensions and pixel means") {
    import spark.implicits._
    val (p1, m1) = pngBytes(40, 24)
    val (p2, m2) = pngBytes(8, 8)
    val media = Seq((1L, p1), (2L, p2)).toDF("doc_id", "payload")

    val meta = Multimodal.decodeMeta(media, Multimodal.ImageIoCodec)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"),
          r.getAs[Double]("mean_byte"))))
      .toMap
    assert(meta(1L)._1 == 40 && meta(1L)._2 == 24 && meta(1L)._3 == 1)
    assert(meta(2L)._1 == 8 && meta(2L)._2 == 8)
    assert(math.abs(meta(1L)._4 - m1) < 1e-9, s"mean ${meta(1L)._4} != $m1")
    assert(math.abs(meta(2L)._4 - m2) < 1e-9)
    // n_bytes is the COMPRESSED payload size (the PNG), not the raster
    val nb = Multimodal.decodeMeta(media, Multimodal.ImageIoCodec)
      .filter($"doc_id" === 1L).head().getAs[Long]("n_bytes")
    assert(nb == p1.length.toLong)

    // resize: output re-decodes as a real 10x6 PNG whose pixels are the
    // nearest-neighbor samples of the source gradient
    val resized = Multimodal.resizeImage(media.filter($"doc_id" === 1L), 10, 6).head()
    assert(resized.getAs[Int]("out_w") == 10 && resized.getAs[Int]("out_h") == 6)
    val rImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.getAs[Array[Byte]]("payload")))
    assert(rImg.getWidth == 10 && rImg.getHeight == 6)
    for (y <- 0 until 6; x <- 0 until 10) {
      val (sx, sy) = (x * 40 / 10, y * 24 / 6)
      val vExpect = (sx * 7 + sy * 13) % 256
      assert((rImg.getRGB(x, y) & 0xff) == vExpect, s"pixel ($x,$y)")
    }

    // features: luminance histogram is L1-normalized and matches the
    // gradient's exact distribution in a spot-checked bucket
    val row = Multimodal.imageFeatures(media.filter($"doc_id" === 2L), dim = 16).head()
    val feats = row.getSeq[Float](row.fieldIndex("features"))
    assert(feats.length == 16)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-6)
    val lums = for (y <- 0 until 8; x <- 0 until 8) yield (x * 7 + y * 13) % 256
    val bucket3 = lums.count(v => v * 16 / 256 == 3).toFloat / 64
    assert(math.abs(feats(3) - bucket3) < 1e-6)

    // corrupt payload fails loudly, not silently
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad, Multimodal.ImageIoCodec).collect()
    }
    assert(e.getMessage != null)
  }
}
