package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents, in a stable global order, to
  * training chunks of ~`budget` tokens — the step that turns a cleaned
  * corpus into fixed-budget training sequences.
  *
  * A document's chunk is `floor(exclusive-prefix-token-sum / budget)`:
  * deterministic given the order, one pass, and a chunk only ever
  * overflows the budget by less than its last document (the standard
  * distributed approximation of greedy packing — exact greedy is
  * inherently sequential).
  *
  * The global running sum is the textbook DISTRIBUTED PREFIX SUM — a
  * naive `sum over (order by id)` window has no partition key, so Spark
  * would drag the whole corpus through ONE task. Instead:
  *
  *   1. bucket documents by `doc_id div bucketSize`;
  *   2. per-bucket token totals (tiny relation: |corpus|/bucketSize
  *      rows) get an exclusive running sum — the only unpartitioned
  *      window, over the tiny relation, and it broadcasts back;
  *   3. the per-document exclusive sum is bucket offset + an
  *      intra-bucket running sum (a KEYED window — parallel).
  */
object Packing {

  /** (doc_id, n_tokens, chunk_id) per document; whitespace tokens. */
  def chunkAssignments(
      docs: DataFrame,
      budget: Long = 512L,
      bucketSize: Long = 256L
  ): DataFrame = {
    require(budget > 0 && bucketSize > 0, "budget and bucketSize must be positive")
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr(s"doc_id div $bucketSize").as("bucket")
    )
    val bucketTotals = toks.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("btotal"))
    // the one ordered-unpartitioned window runs on the bucket relation
    val wb = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.select(
      col("bucket"),
      coalesce(sum(col("btotal")).over(wb), lit(0L)).as("offset")
    )
    val wd = Window
      .partitionBy(col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      // hint-free: offsets has corpus/bucketSize rows — DATA-DEPENDENT
      // (millions of buckets at 100 TB); AQE picks the build side
      .join(offsets, "bucket")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("offset") + coalesce(sum(col("n_tokens")).over(wd), lit(0L))).as("cum_excl")
      )
      // integral div, not Column `/` (double) — exact at any magnitude
      .select(col("doc_id"), col("n_tokens"), expr(s"cum_excl div $budget").as("chunk_id"))
  }

  /** Chunk manifest: docs, tokens, and the id span per chunk. */
  def packByTokenBudget(
      docs: DataFrame,
      budget: Long = 512L,
      bucketSize: Long = 256L
  ): DataFrame =
    chunkAssignments(docs, budget, bucketSize)
      .groupBy(col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc")
      )
}
