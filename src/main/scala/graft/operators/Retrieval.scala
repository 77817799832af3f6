package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-domain fusion for hybrid retrieval (sparse lexical + dense
  * vector): the glue between the BM25 and ANN families.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher '09): fuse any
    * number of (id, rank) lists by `Σ 1/(k₀+rank)` — the standard
    * score-free hybrid that needs no calibration between BM25 scores and
    * cosines. Rank-domain means the inputs are already top-N-sized, so
    * fusion is an agg over |lists|·N rows no matter the corpus size; the
    * reciprocal sums are single correctly-rounded IEEE ops per term, so
    * scores are engine-exact before the output rounding.
    *
    * Output: top-k (id, n_lists, rrf) by fused score desc, id asc.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      k0: Int = 60,
      topK: Int = 20
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings
      .map(_.select(col(idCol), col("rank")))
      .reduce(_ union _)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lists"),
        round(sum(lit(1.0) / (lit(k0) + col("rank"))), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }
}
