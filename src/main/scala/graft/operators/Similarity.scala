package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the build rules:
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *     against the full corpus; one scan, no shuffle of the corpus, a
  *     partial top-k per partition then final top-k (window over the
  *     candidate set). The correctness baseline.
  *   - [[lshTopK]]: SRP-LSH bucketed search — corpus and queries hashed to
  *     sign-bit buckets; only same-bucket candidates are scored. At 100 TB
  *     the bucket join replaces the full scan per query with a hash lookup;
  *     recall is tunable via tables × planes.
  */
object Similarity {

  private def cosCol(a: Column, b: Column): Column =
    VectorOps.cosine(VectorOps.toDouble(a), VectorOps.toDouble(b))

  /** Exact top-k neighbors for each query vector (query set must be small
    * enough to broadcast — it is the `LIMIT`ed probe set, not the corpus).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val scored = corpus
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosCol(col("q_vec"), col("embedding")), 6).as("cosine")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: score only corpus vectors landing in the same
    * signature bucket as the query in at least one table. Returns up to k
    * neighbors per query (possibly fewer — recall/latency trade-off).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      dim: Int = 64,
      tables: Int = 8,
      planesPerTable: Int = 6,
      seed: Long = 7L
  ): DataFrame = {
    val planes = Dedup.hyperplanes(dim, tables, planesPerTable, seed)
    def sigCols(vec: Column): Seq[Column] = planes.zipWithIndex.map { case (tablePlanes, t) =>
      tablePlanes.zipWithIndex
        .map { case (p, i) =>
          when(VectorOps.dot(VectorOps.toDouble(vec), array(p.map(lit): _*)) >= 0, lit(1 << i))
            .otherwise(lit(0))
        }
        .reduce(_ + _)
        .as(s"sig$t")
    }
    val c = corpus.select(Seq(col("vec_id"), col("embedding")) ++ sigCols(col("embedding")): _*)
    val q = queries.select(
      Seq(col("vec_id").as("query_id"), col("embedding").as("q_vec")) ++ sigCols(col("embedding")): _*
    )
    val candidates = (0 until tables)
      .map { t =>
        c.join(broadcast(q.select(col("query_id"), col("q_vec"), col(s"sig$t").as("qs"))), col(s"sig$t") === col("qs"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("q_vec"), col("vec_id").as("neighbor_id"), col("embedding"))
      }
      .reduce(_ union _)
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol(col("q_vec"), col("embedding")), 6).as("cosine")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
