package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed word co-occurrence counts + pointwise mutual information —
  * the association-mining pass behind embedding-prep pipelines
  * (word2vec-style contexts, collocation extraction, topic seeding).
  *
  * Scale shape: pair generation is SCAN-SIDE — for each offset
  * 1..window, the token array is zipped with its own shifted slice, so
  * no self-join (the naive position range-join) ever materializes; the
  * only shuffle is the final pair-count aggregation, map-side-combined
  * to the (small) vocabulary-pair domain.
  */
object Cooccur {

  /** Unordered co-occurring pairs within `window` token positions, with
    * counts and PMI = ln((c_ab/T) / ((c_a/N)·(c_b/N))) — pair probability
    * from the pair-event total T, unigram probabilities from the token
    * total N. Returns the `topK` pairs by (count DESC, a, b).
    */
  def pmiPairs(docs: DataFrame, window: Int = 2, topK: Int = 20): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ts = split(col("text"), " ")
    // One struct list per offset: (tok[i], tok[i+off]) canonicalized to
    // unordered (least, greatest); flatten the offsets, one explode.
    val offsetPairs = (1 to window).map { off =>
      zip_with(
        slice(ts, lit(1), greatest(size(ts) - off, lit(0))),
        slice(ts, lit(1 + off), greatest(size(ts) - off, lit(0))),
        (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b"))
      )
    }
    val pairs = docs
      .select(explode(flatten(array(offsetPairs: _*))).as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
      .filter(col("a") =!= "" && col("b") =!= "")
    val pairCounts = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val toks = docs
      .select(explode(ts).as("w"))
      .filter(col("w") =!= "")
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val totals = pairCounts
      .agg(sum("c_ab").as("t_pairs"))
      .crossJoin(toks.agg(count(lit(1)).as("n_toks")))
    pairCounts
      .join(broadcast(uni.select(col("w").as("a"), col("c_w").as("c_a"))), "a")
      .join(broadcast(uni.select(col("w").as("b"), col("c_w").as("c_b"))), "b")
      .crossJoin(broadcast(totals))
      .select(
        col("a"),
        col("b"),
        col("c_ab"),
        round(
          log(
            (col("c_ab").cast("double") / col("t_pairs")) /
              ((col("c_a").cast("double") / col("n_toks")) *
                (col("c_b").cast("double") / col("n_toks")))),
          6).as("pmi"))
      .orderBy(col("c_ab").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }
}
