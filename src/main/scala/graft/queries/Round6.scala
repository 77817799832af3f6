package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Round-6 additions (q123+).
  *
  * Scale-path upgrades to existing families: IVF-PQ composed ANN (the
  * cell-pruned replacement for the full-corpus PQ ADC scan), plus
  * corpus-curation operators a 100 TB training pipeline runs between
  * dedup and packing: cross-document line-level dedup (the C4 trick) and
  * others as the round progresses.
  */
object Round6 {

  /** IVF-PQ ANN ([[graft.operators.Similarity.ivfPqTopK]]): coarse cells
    * prune candidates, PQ codes compress scoring, exact rerank restores
    * true cosines. Rows-only like the other approximate ANN paths
    * (q31/q46/q80 — the trained model is engine-specific); exact-score
    * parity, recall floor and the no-crossJoin plan shape are pinned in
    * OperatorsSpec/PlanAuditSpec.
    */
  val q123AnnIvfPq: QueryDef = QueryDef(
    "q123_ann_ivfpq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    None
  )

  /** REAL image decode in the correctness gate: each document becomes a
    * genuine PNG (deterministic per-doc gradient raster, JDK ImageIO
    * encode), decoded back through
    * [[graft.operators.Multimodal.ImageIoCodec]] — actual compressed
    * bytes in, actual raster out. The reported width/height/mean
    * luminance have closed forms, so DuckDB verifies the WHOLE
    * encode→decode trip arithmetically without ever touching an image:
    * any codec deviation (dimension swap, color management, truncation)
    * breaks the hash match. Payload size is deliberately NOT emitted —
    * PNG encoder output is JRE-specific; raster content is not.
    */
  val q124ImageRoundtrip: QueryDef = QueryDef(
    "q124_image_roundtrip",
    (s, dir) => {
      import s.implicits._
      val media = Tables
        .documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 17).toInt
            val h = (16 + id % 13).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((x * 7 + y * 13 + id) % 256).toInt
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }
        .toDF("doc_id", "payload")
      graft.operators.Multimodal
        .decodeMeta(media, graft.operators.Multimodal.ImageIoCodec)
        .select(
          col("doc_id"),
          col("width"),
          col("height"),
          round(col("mean_byte"), 6).as("mean_lum"))
    },
    Some("""WITH dims AS (
              SELECT doc_id,
                     CAST(16 + doc_id % 17 AS INT) AS width,
                     CAST(16 + doc_id % 13 AS INT) AS height
              FROM documents),
            px AS (
              SELECT d.doc_id, d.width, d.height,
                     avg(CAST((x.x * 7 + y.y * 13 + d.doc_id) % 256 AS DOUBLE)) AS m
              FROM dims d
              JOIN range(0, 33) x(x) ON x.x < d.width
              JOIN range(0, 29) y(y) ON y.y < d.height
              GROUP BY 1, 2, 3)
            SELECT doc_id, width, height, round(m, 6) AS mean_lum FROM px""")
  )

  val all: Seq[QueryDef] = Seq(q123AnnIvfPq, q124ImageRoundtrip)
}
