package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction running batched per partition.
  *
  * The codec is a SEAM ([[MediaCodec]]) with two implementations:
  *
  *   - [[StubCodec]] — deterministic arithmetic on the payload bytes, so
  *     the DuckDB oracle replays it byte-for-byte (q36/q47); synthetic
  *     fixtures and the video-ish frame/sample shapes run on it.
  *   - [[ImageIoCodec]] — REAL image decode through JDK `ImageIO`
  *     (PNG/BMP/GIF/JPEG, no dependency beyond the JRE): width/height
  *     from the decoded raster, mean over true luminance. The real-bytes
  *     path for [[decodeMeta]], [[resizeImage]] and [[imageFeatures]];
  *     BinaryIngestSpec round-trips genuine PNGs through it.
  *
  * Either way the dataflow — `binary` column in, typed struct out,
  * partition-parallel batched decode, no driver collection, no shuffle —
  * is exactly what a production pipeline runs at 100 TB (each task
  * decodes its own partition's blobs; a heavier codec like an ffmpeg
  * pipe slots into the same seam).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double
  )

  /** The decode seam: one instance per task, records streamed through. */
  trait MediaCodec extends Serializable {
    def decode(r: MediaRecord): MediaMeta
  }

  /** Deterministic fake decode: metadata derived arithmetically from the
    * payload so the DuckDB oracle can replicate it byte-for-byte.
    */
  object StubCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length.toLong
      val first = if (n > 0) r.payload(0) & 0xff else 0
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        width = (64L + n % 577L).toInt,
        height = (64L + (n * 31L + first) % 353L).toInt,
        n_frames = (1L + n % 7L).toInt,
        mean_byte = if (n > 0) sum.toDouble / n else 0.0
      )
    }
  }

  /** Real image decode via JDK `ImageIO`: dimensions from the decoded
    * raster, `mean_byte` as the mean luminance ((r+g+b)/3) over actual
    * pixels — not the compressed payload bytes. Single-image formats →
    * n_frames = 1. Throws on an undecodable payload: silently emitting
    * junk metadata for corrupt blobs is how a 100 TB media sweep poisons
    * its downstream filters; callers wanting drop-semantics filter by
    * magic bytes first (or wrap the codec).
    */
  object ImageIoCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          x += 1
        }
        y += 1
      }
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = r.payload.length.toLong,
        width = w,
        height = h,
        n_frames = 1,
        mean_byte = if (w * h > 0) sum / (w.toLong * h) else 0.0
      )
    }
  }

  implicit private val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit private val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** documents.text reinterpreted as a binary media payload — the lake has
    * no real blobs, so UTF-8 bytes stand in; the column type (`binary`)
    * and everything downstream is the real thing.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batched partition-parallel decode: one codec instance per task,
    * streaming the partition's records through it (the `mapInPandas` batch
    * shape, Scala-typed). Default codec is the oracle-replayable stub;
    * pass [[ImageIoCodec]] for real image bytes.
    */
  def decodeMeta(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame =
    media
      .as[MediaRecord]
      .mapPartitions(batch => batch.map(codec.decode))
      .toDF()

  final case class Frame(doc_id: Long, frame_id: Int, frame_bytes: Long, frame_mean_byte: Double)

  final case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int, payload: Array[Byte])

  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  implicit private val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit private val resizedEnc: Encoder[ResizedMedia] = Encoders.product[ResizedMedia]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Frame sampling — the one-row-per-frame explode shape of video
    * pipelines: the payload splits into the stub's `n_frames` contiguous
    * frames (frame j = bytes [j·n/f, (j+1)·n/f)), and every `stride`-th
    * frame is emitted with its own metadata. flatMap per partition — a
    * task fans out only its own blobs; no shuffle, no driver collection.
    * The frame arithmetic is deterministic, so the DuckDB oracle
    * replicates it byte-for-byte (q47).
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame =
    media
      .as[MediaRecord]
      .flatMap { r =>
        val n = r.payload.length
        val f = (1L + n % 7L).toInt
        (0 until f).by(stride).map { j =>
          val start = (j.toLong * n / f).toInt
          val end = ((j + 1).toLong * n / f).toInt
          var sum = 0L
          var i = start
          while (i < end) { sum += r.payload(i) & 0xff; i += 1 }
          val len = end - start
          Frame(r.doc_id, j, len.toLong, if (len > 0) sum.toDouble / len else 0.0)
        }
      }
      .toDF()

  /** Resize — payload-in/payload-out transform shape: deterministic
    * nearest-neighbor downsample of the byte stream to exactly out_w·out_h
    * bytes (positions i·n/(w·h)). A real image resampler replaces only the
    * byte mapping; schema and per-partition batching stay.
    */
  def resize(media: DataFrame, outW: Int = 32, outH: Int = 32): DataFrame =
    media
      .as[MediaRecord]
      .mapPartitions { batch =>
        val outLen = outW * outH
        batch.map { r =>
          val n = r.payload.length
          val out = new Array[Byte](if (n == 0) 0 else outLen)
          var i = 0
          while (n > 0 && i < outLen) {
            out(i) = r.payload((i.toLong * n / outLen).toInt)
            i += 1
          }
          ResizedMedia(r.doc_id, outW, outH, out)
        }
      }
      .toDF()

  /** REAL-pixel resize: ImageIO decode → nearest-neighbor rescale
    * (deterministic: no interpolation, no dithering) → lossless PNG
    * re-encode. Same per-partition batch shape as the stub [[resize]];
    * this is the variant that runs when payloads are genuine images.
    */
  def resizeImage(media: DataFrame, outW: Int = 32, outH: Int = 32): DataFrame = {
    require(outW > 0 && outH > 0, "output dimensions must be positive")
    media
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { r =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // manual nearest-neighbor sampling: pixel (x,y) <- source
          // (x*w/outW, y*h/outH) — bit-deterministic across JREs, unlike
          // Graphics2D scaling hints
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              out.setRGB(x, y,
                img.getRGB((x.toLong * img.getWidth / outW).toInt,
                  (y.toLong * img.getHeight / outH).toInt))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedMedia(r.doc_id, outW, outH, bos.toByteArray)
        }
      }
      .toDF()
  }

  /** REAL-pixel features: `dim`-bucket L1-normalized LUMINANCE histogram
    * over the decoded raster — the ImageIO sibling of
    * [[byteHistogramFeatures]], emitting the same `array<float>`
    * embedding shape for [[Similarity]].
    */
  def imageFeatures(media: DataFrame, dim: Int = 64): DataFrame =
    media
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { r =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
          val hist = new Array[Float](dim)
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              hist(lum * dim / 256) += 1f
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          if (n > 0) { var j = 0; while (j < dim) { hist(j) /= n; j += 1 } }
          MediaFeatures(r.doc_id, hist)
        }
      }
      .toDF()

  /** Feature extraction — the embed shape feeding similarity search: a
    * `dim`-bucket L1-normalized byte histogram per payload as
    * `array<float>`, drop-in compatible with [[Similarity]]'s `embedding`
    * column (asserted in OperatorsSpec by running bruteTopK over it).
    */
  def byteHistogramFeatures(media: DataFrame, dim: Int = 64): DataFrame =
    media
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { r =>
          val hist = new Array[Float](dim)
          var i = 0
          while (i < r.payload.length) {
            hist((r.payload(i) & 0xff) % dim) += 1f
            i += 1
          }
          if (r.payload.length > 0) {
            var j = 0
            while (j < dim) { hist(j) /= r.payload.length; j += 1 }
          }
          MediaFeatures(r.doc_id, hist)
        }
      }
      .toDF()

  /** REAL RIFF/WAV PCM audio: header-validated parse of actual
    * little-endian bytes (pure JDK, no codec library), plus a
    * deterministic square-wave synthesizer whose acoustic statistics
    * have CLOSED FORMS — the audio sibling of [[ImageIoCodec]]'s PNG
    * round trip: the oracle never touches a byte, yet any header/parse/
    * endianness error breaks the reported numbers.
    */
  object WavCodec {

    /** Mono 16-bit PCM square wave: freq 200+(id%8)·100 Hz, peak
      * 1000+(id%20)·1500, `nSamples` samples at `sampleRate`. The phase
      * is pure integer arithmetic — no trig, so no libm-ulp divergence
      * between synthesis and any replay.
      */
    def synthesizeSquare(id: Long, sampleRate: Int = 8000, nSamples: Int = 800): Array[Byte] = {
      val freq = 200L + (id % 8) * 100L
      val amp = (1000L + (id % 20) * 1500L).toInt
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer
        .allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1) // PCM, mono
      bb.putInt(sampleRate).putInt(sampleRate * 2)
      bb.putShort(2).putShort(16) // block align, bits
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        val s = if ((2L * freq * i / sampleRate) % 2 == 0) amp else -amp
        bb.putShort(s.toShort)
        i += 1
      }
      bb.array()
    }

    final case class WavStats(
        doc_id: Long,
        sample_rate: Int,
        n_samples: Long,
        duration_ms: Long,
        peak: Long,
        sum_sq: Long,
        zero_crossings: Long)

    /** Parse + integer acoustic stats. Validates every RIFF marker and
      * the PCM/mono/16-bit shape — corrupt blobs throw (the
      * [[ImageIoCodec]] contract).
      */
    def decode(id: Long, bytes: Array[Byte]): WavStats = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(tag() == "RIFF", s"doc $id: missing RIFF")
      bb.getInt()
      require(tag() == "WAVE", s"doc $id: missing WAVE")
      require(tag() == "fmt ", s"doc $id: missing fmt chunk")
      require(bb.getInt() == 16, s"doc $id: non-PCM fmt size")
      require(bb.getShort() == 1, s"doc $id: not PCM")
      require(bb.getShort() == 1, s"doc $id: not mono")
      val sr = bb.getInt()
      bb.getInt() // byte rate
      bb.getShort() // block align
      require(bb.getShort() == 16, s"doc $id: not 16-bit")
      require(tag() == "data", s"doc $id: missing data chunk")
      val dataLen = bb.getInt()
      val n = dataLen / 2
      var peak = 0L
      var sumSq = 0L
      var crossings = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val s = bb.getShort().toInt
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        sumSq += s.toLong * s
        if (i > 0 && ((s >= 0) != (prev >= 0))) crossings += 1
        prev = s
        i += 1
      }
      WavStats(id, sr, n.toLong, n.toLong * 1000L / sr, peak, sumSq, crossings)
    }
  }

  final case class AHash(doc_id: Long, w0: Long, w1: Long)
  implicit private val aHashEnc: Encoder[AHash] = Encoders.product[AHash]

  /** PERCEPTUAL average-hash (aHash) of each media payload: 64 samples
    * at positions ⌊i·n/64⌋ (the stub [[resize]] mapping, i.e. an 8×8
    * thumbnail of the byte stream), bit i set iff sample i is STRICTLY
    * above the thumbnail mean. The mean is Σ/64 — a dyadic divisor, so
    * it is exact in doubles and the bit pattern replays on any engine.
    * The hash lands in TWO 32-bit words (bits 0–31 / 32–63): no sign
    * bit is ever set, so XOR/popcount/shift stay portable (the
    * [[graft.operators.Bitmap]] sign-free posture). On real images the
    * same function runs after [[resizeImage]] grayscaling — the seam
    * is the byte source, not the hash.
    */
  def imageAHash(media: DataFrame): DataFrame =
    media
      .as[MediaRecord]
      .filter((r: MediaRecord) => r.payload.length > 0)
      .mapPartitions { batch =>
        batch.map { r =>
          val n = r.payload.length
          val samples = Array.tabulate(64)(i => r.payload((i.toLong * n / 64).toInt) & 0xff)
          val mean = samples.sum / 64.0
          var w0 = 0L
          var w1 = 0L
          var i = 0
          while (i < 64) {
            if (samples(i) > mean) {
              if (i < 32) w0 |= 1L << i else w1 |= 1L << (i - 32)
            }
            i += 1
          }
          AHash(r.doc_id, w0, w1)
        }
      }
      .toDF()

  /** aHash NEAR-DUP pairs with GUARANTEED recall at Hamming ≤ 7: the
    * 64-bit hash splits into eight 8-bit bands; two hashes within
    * Hamming 7 must agree on ≥ one band (pigeonhole), so the band-
    * bucket equi-join generates a candidate superset and the exact
    * popcount filter keeps truth — the image-side twin of the SimHash
    * text pipeline ([[Dedup]]), near-linear instead of all-pairs. The
    * ≤ 7 radius (vs SimHash's ≤ 3) reflects the hash: an 8×8 byte
    * thumbnail is coarser than a token sketch, so perceptual "same
    * image, re-encoded" pairs land further apart.
    *
    * Output: (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤ 7.
    */
  def aHashNearDup(media: DataFrame): DataFrame = {
    val h = imageAHash(media).localCheckpoint()
    val bandCols = (0 until 8).map { k =>
      val word = if (k < 4) col("w0") else col("w1")
      concat_ws(":", lit(k), shiftright(word, (k % 4) * 8).bitwiseAND(lit(255L)))
    }
    val banded = h.select(
      col("doc_id"), col("w0"), col("w1"),
      explode(array(bandCols: _*)).as("band"))
    banded.as("a")
      .join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.w0").bitwiseXOR(col("b.w0"))) +
          bit_count(col("a.w1").bitwiseXOR(col("b.w1")))).cast("long").as("hamming"))
      .filter(col("hamming") <= 7)
      .distinct()
  }
}
