package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorCosine

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
  *
  * Scoring uses [[VectorCosine]] — one compiled pass per pair,
  * bit-identical to the `zip_with`/`aggregate` double fold (and so to the
  * DuckDB oracle), minus the interpreted-lambda overhead.
  */
object Similarity {

  private def cosCol(a: String, b: String): Column = {
    // Registered once per session; name is stable.
    expr(s"vector_cosine($a, $b)")
  }

  /** Exact top-k neighbors for each query vector (query set must be small
    * enough to broadcast — it is the `LIMIT`ed probe set, not the corpus).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    VectorCosine.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val scored = corpus
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine")
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
    val spark = corpus.sparkSession
    val fn = s"srp_ann_${tables}_${planesPerTable}_$seed"
    graft.functions.SrpSignatures.register(spark, fn, dim, tables, planesPerTable, seed)
    VectorCosine.register(spark)
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(
          col("vec_id").as(idAs),
          col("embedding").as(vecAs),
          posexplode(expr(s"$fn(embedding)")).as(Seq("table_id", "sig"))
        )
    val c = banded(corpus, "neighbor_id", "embedding")
    val q = banded(queries, "query_id", "q_vec")
      .withColumnRenamed("table_id", "q_table_id")
      .withColumnRenamed("sig", "q_sig")
    // One bucket join on (table, signature); the probe set broadcasts.
    val candidates = c
      .join(
        broadcast(q),
        col("table_id") === col("q_table_id") && col("sig") === col("q_sig") &&
          col("neighbor_id") =!= col("query_id")
      )
      .select(col("query_id"), col("q_vec"), col("neighbor_id"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
