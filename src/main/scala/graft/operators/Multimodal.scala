package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction running batched per partition.
  *
  * The Spark-side shape is real and tested — schema, partition-parallel
  * batched decode, typed output — while the codec itself is a STUB
  * (deterministic arithmetic on the payload bytes): this container has no
  * image/audio libraries, per the build rules. Swapping [[StubCodec]] for a
  * real decoder (JNI image lib, ffmpeg pipe) changes one function; the
  * dataflow — `binary` column in, metadata struct out, no driver
  * collection, no shuffle — is exactly what a production pipeline runs at
  * 100 TB (each task decodes its own partition's blobs).
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

  /** Deterministic fake decode: metadata derived arithmetically from the
    * payload so the DuckDB oracle can replicate it byte-for-byte.
    * A real codec replaces exactly this function (`???`-equivalent seam).
    */
  object StubCodec {
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
    * shape, Scala-typed).
    */
  def decodeMeta(media: DataFrame): DataFrame =
    media
      .as[MediaRecord]
      .mapPartitions(batch => batch.map(StubCodec.decode))
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
}
