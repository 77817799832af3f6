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

  val all: Seq[QueryDef] = Seq(q123AnnIvfPq)
}
