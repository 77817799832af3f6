package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al., ACL'16) — the
  * tokenizer-building step of an LLM data pipeline, run as Spark jobs.
  *
  * Scale shape: BPE trains on the DISTINCT-WORD FREQUENCY TABLE, not the
  * raw corpus — the one full-corpus pass is the initial `groupBy(word)`,
  * which compresses 100 TB of text to a vocabulary-sized table (here 31
  * rows; real corpora: millions — still a small shuffle). Each merge step
  * is then a pair-count aggregation + greedy merge over that small table;
  * the only driver-side data is the learned RULE itself (one row per
  * step, exactly like [[Similarity]]'s driver-side quantizer models).
  *
  * Determinism contract (what makes the DuckDB replay possible):
  * pair counts are exact integers; the argmax tie-break is
  * (freq DESC, left ASC, right ASC) in binary string order; the merge is
  * greedy left-to-right — overlapping matches (only possible when
  * left == right, e.g. "aaaa" with (a,a)) consume pairs at odd positions
  * of each run, which the oracle reproduces with a run-parity window.
  */
object Bpe {

  /** Learn `steps` merge rules; returns (step, left_tok, right_tok, freq)
    * with `freq` = the merged pair's corpus frequency when it was chosen.
    */
  def trainMerges(docs: DataFrame, steps: Int = 8): DataFrame =
    trainState(docs, steps)._1

  /** Apply the learned merges — the ENCODE side of the tokenizer: the
    * per-word final token sequences (md5-pinned) with frequencies, i.e.
    * the vocabulary a 100 TB encode job broadcasts; corpus token totals
    * and the compression ratio follow by weighting with `freq`.
    */
  def encode(docs: DataFrame, steps: Int = 8): DataFrame = {
    val (_, wf) = trainState(docs, steps)
    wf.select(
      col("word"),
      col("freq"),
      size(col("toks")).as("n_toks"),
      md5(array_join(col("toks"), "|")).as("toks_md5"))
  }

  private def trainState(docs: DataFrame, steps: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The corpus pass: word frequencies, words split to character tokens.
    // localCheckpoint per step keeps the 8-fold iterated plan bounded
    // (the connectedComponents/PageRank pattern).
    var wf = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to steps) {
      val pairs = wf.select(
        col("freq"),
        explode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (x, y) => struct(x.as("a"), y.as("b"))
          )).as("pr"))
      val top = pairs
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("a").asc, col("b").asc)
        .limit(1)
        .head()
      val (a, b, f) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((step, a, b, f))
      // Greedy left-to-right merge as an array fold: append, except when
      // the accumulator's last token is `a` and the next is `b` — then
      // replace the last with the merged token. `get` (not element_at)
      // so the empty-accumulator probe is a null, not an ANSI error.
      wf = wf
        .withColumn(
          "toks",
          aggregate(
            col("toks"),
            array().cast("array<string>"),
            (acc, x) =>
              when(
                get(acc, size(acc) - 1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                .otherwise(concat(acc, array(x)))
          ))
        .localCheckpoint()
    }
    (merges.result().toDF("step", "left_tok", "right_tok", "freq"), wf)
  }
}
