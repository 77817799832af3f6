package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trigram inverted index for substring search — how `LIKE '%...%'`
  * stops being a full corpus scan at 100 TB (the pg_trgm / code-search
  * design): a document can contain the pattern only if it contains every
  * character trigram of the pattern, so the index join produces a small
  * candidate superset and the exact `contains` check touches candidates
  * only.
  *
  * Relational all the way: per-doc DISTINCT trigrams are a scan-side
  * position explode (codegen, no lambda); the pattern's trigrams are
  * derived IN-ENGINE from the literal (so the oracle replays them); the
  * all-trigrams gate is a counting semi-join (`matched = |pattern
  * trigrams|`). On a real deployment the doc-trigram relation is the
  * persisted index, bucketed by trigram; queries are index lookups.
  */
object TrigramIndex {

  /** Search `docs.text` for a literal substring via the trigram gate.
    * Output: one row per CANDIDATE doc — (doc_id, confirmed), where
    * `confirmed` is the exact contains verdict; false rows are the
    * index's false positives (visible on purpose: they measure index
    * selectivity).
    */
  def substringSearch(docs: DataFrame, pattern: String): DataFrame = {
    require(pattern.length >= 3, "pattern must be at least 3 chars")
    val spark = docs.sparkSession
    val litPat = pattern.replace("'", "''")
    val pats = spark
      .range(0, (pattern.length - 2).toLong)
      .selectExpr(s"substring('$litPat', id + 1, 3) AS tg")
      .distinct()
    val nPat = pats.agg(count(lit(1)).as("np"))
    // The broadcast pattern-trigram semi-join runs BEFORE the dedup:
    // the distinct (the only corpus-wide shuffle here) then carries just
    // the hit pairs instead of every (doc, trigram) — on a persisted
    // index this pruning is the trigram-bucket lookup itself.
    val docTg = docs
      .filter(length(col("text")) >= 3)
      .select(
        col("doc_id"),
        explode(sequence(lit(0), length(col("text")) - 3)).as("pos"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, pos + 1, 3)").as("tg"))
      .join(broadcast(pats), "tg")
      .distinct()
    val candidates = docTg
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nh"))
      .crossJoin(broadcast(nPat))
      .filter(col("nh") === col("np"))
      .select(col("doc_id"))
    candidates
      .join(docs, "doc_id")
      .select(col("doc_id"), col("text").contains(pattern).as("confirmed"))
  }
}
