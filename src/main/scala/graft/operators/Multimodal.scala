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
}
