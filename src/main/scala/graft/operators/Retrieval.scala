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

  /** Exact phrase search through a POSITIONAL inverted index: documents
    * explode to (token, doc_id, pos) postings, each phrase term selects
    * its postings list, and consecutive terms align by an EQUI-join on
    * (doc_id, pos − offset) — the classic positional-index intersection
    * (Manning/Raghavan/Schütze IR ch. 2), not a regex re-scan of every
    * document per query.
    *
    * Scale shape: each term's filter prunes the postings to ONE token's
    * list before any join (pushed to the scan side of the explode), so
    * join input is Σ term document-frequencies, not the corpus; the
    * joins are hash equi-joins keyed on (doc_id, pos) — skew-free unless
    * a phrase repeats a stopword, which the df-ordered term choice of a
    * real planner would anchor (documented, not needed at test scale).
    * On a persisted index the explode amortizes across queries.
    *
    * Output: (doc_id, n_matches) for documents containing the phrase at
    * least once, one row per doc.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val postings = docs.select(
      col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val anchor = postings
      .filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex
      .drop(1)
      .foldLeft(anchor) { case (cur, (term, offset)) =>
        cur.join(
          postings
            .filter(col("tok") === term)
            .select(col("doc_id"), (col("pos") - offset).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }
}
