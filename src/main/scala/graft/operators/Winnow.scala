package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document-overlap detection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): per document, hash every word n-gram,
  * slide a w-wide window over the hash sequence keeping each window's
  * minimum, and use the distinct selected hashes as the document's
  * FINGERPRINT set. Documents sharing many fingerprints share long runs
  * of text — the passage-level (substring) analogue of the whole-document
  * near-dup operators in [[Dedup]], and the standard way a training-data
  * pipeline finds copied paragraphs rather than copied documents.
  *
  * Guarantee inherited from winnowing: any shared token run of length
  * >= n + w - 1 contributes at least one shared fingerprint, while runs
  * shorter than n are never detected — so `minShared` calibrates how much
  * copied text flags a pair.
  *
  * Scale design:
  *   - fingerprint selection is ROW-LOCAL (array ops inside one
  *     projection — no explode, no window function, no shuffle): the
  *     whole corpus scan is one codegen stage emitting ~len/w
  *     fingerprints per doc;
  *   - the pair join is an inverted-index equi-join on fingerprint
  *     (shuffle keyed by a 32-bit hash — uniform by construction);
  *   - `maxDocFreq` drops stop-fingerprints (shared boilerplate) before
  *     the join — the postings-list cap that keeps the join output
  *     near-linear instead of quadratic in corpus size; at 100 TB this is
  *     the difference between a join and an explosion, exactly like the
  *     prefix-filter bound in [[Dedup.ngramJaccardPairs]].
  *
  * The hash is the first 8 md5 hex digits of the shingle string (the
  * engine-independent hash of [[Sampling]]), so a SQL oracle can rebuild
  * the identical fingerprint sets.
  */
object Winnow {

  /** 32-bit engine-independent hash of a string column. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Per-document winnowed fingerprint set: (doc_id, fingerprint) rows.
    * Documents shorter than n + w - 1 tokens have no complete window and
    * are dropped (they cannot share a passage of detectable length).
    */
  def fingerprints(docs: DataFrame, n: Int = 4, w: Int = 4): DataFrame = {
    require(n > 0 && w > 0, "n and w must be positive")
    val ts = split(col("text"), " ")
    // shingle i (0-based): tokens i..i+n-1 joined by space, hashed
    val hs = transform(
      sequence(lit(0), size(col("__ts")) - n),
      i => h32(concat_ws(" ", slice(col("__ts"), i + 1, lit(n))))
    )
    // window i: min of hs[i..i+w-1]; selected = distinct window minima
    val fps = array_distinct(
      transform(
        sequence(lit(0), size(col("__hs")) - w),
        i => array_min(slice(col("__hs"), i + 1, lit(w)))
      )
    )
    docs
      .select(col("doc_id"), ts.as("__ts"))
      .filter(size(col("__ts")) >= n + w - 1) // guard BEFORE sequence: a
      // descending junk sequence is what sequence(0, negative) returns
      .select(col("doc_id"), hs.as("__hs"))
      .select(col("doc_id"), explode(fps).as("fingerprint"))
  }

  /** Document pairs sharing at least `minShared` winnowed fingerprints:
    * (doc_a, doc_b, n_shared). Fingerprints appearing in more than
    * `maxDocFreq` documents are dropped before pairing (see scale notes
    * above); planted near-copies still surface through their rarer
    * fingerprints.
    */
  def overlapPairs(
      docs: DataFrame,
      n: Int = 4,
      w: Int = 4,
      minShared: Int = 4,
      maxDocFreq: Int = 64
  ): DataFrame = {
    // localCheckpoint (not cache): the self-join below would otherwise
    // recompute the full fingerprint scan once per side (self-joins don't
    // share lineage), and a cache here would outlive the operator — the
    // checkpointed partitions are released by the ContextCleaner as soon
    // as the returned plan drops its reference.
    val posting = fingerprints(docs, n, w).localCheckpoint()
    val rare = posting
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fingerprint")
    val p = posting.join(rare, "fingerprint")
    val a = p.toDF("fingerprint", "doc_a")
    val b = p.toDF("fingerprint", "doc_b")
    a.join(b, Seq("fingerprint"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
