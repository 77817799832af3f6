package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode/Muthukrishnan '05) heavy-hitter estimation —
  * the mergeable frequent-items primitive of a lake-scale pipeline, built
  * RELATIONALLY so the sketch itself is engine-independent:
  *
  *   - the d×w counter matrix is a `groupBy (row, bucket) count` over a
  *     scan-side d-fold explode — partial aggregation collapses each
  *     partition's contribution to ≤ d·w rows before the (tiny) shuffle,
  *     and two shard sketches MERGE by adding counters (the reason CMS,
  *     not an exact top-k, is what you run per-shard at 100 TB);
  *   - hashes are md5-derived (`conv(substring(md5(row|key)))`), not an
  *     engine-private function, so a SQL oracle reconstructs the
  *     IDENTICAL counter matrix and estimates — deterministic-sketch
  *     discipline, same move as the md5 SRP planes / SimHash votes.
  *
  * The classic ε-δ contract: estimate ≥ true count always (the spec pins
  * it), and overshoot ≤ εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  */
object CountMin {

  /** md5-derived counter column for hash row `row` and key `key`. */
  def bucketCol(row: Column, key: Column, w: Int): Column =
    pmod(
      conv(substring(md5(concat_ws("|", row, key)), 1, 8), 16, 10).cast("long"),
      lit(w.toLong))

  /** The read-time half of the sketch: min-over-rows estimates for a
    * probe key set against a counter relation (j, bucket, cnt) maintained
    * elsewhere (shard merges — counters ADD — or streaming state).
    * `probes` carries (keyCol, true_cnt); output (keyCol, true_cnt,
    * cms_est) with the usual est ≥ true one-sided error.
    */
  def probeCounters(
      counters: DataFrame,
      probes: DataFrame,
      keyCol: String,
      d: Int,
      w: Int
  ): DataFrame =
    probes
      .select(col(keyCol), col("true_cnt"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", bucketCol(col("j"), col(keyCol), w))
      .join(counters, Seq("j", "bucket"))
      .groupBy(col(keyCol))
      .agg(
        first(col("true_cnt")).as("true_cnt"),
        min(col("cnt")).as("cms_est"))

  /** True top-k keys by exact count next to their CMS estimates: the
    * verification harness a deployment runs on a sample to size (d, w).
    * Output: (key, true_cnt, cms_est) with cms_est ≥ true_cnt.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      d: Int = 4,
      w: Int = 256,
      topK: Int = 10
  ): DataFrame = {
    val key = col(keyCol)
    // One corpus scan: per-key exact counts. Counters then hash DISTINCT
    // keys (d hashes per key, not per event — at sf0.1 that is ~12×
    // fewer md5 evaluations) and weight by the count; the resulting
    // matrix is identical to per-event increments. The same aggregate
    // feeds the probe side, so the raw table is scanned exactly once.
    val keyCounts = df
      .groupBy(key.as("k"))
      .agg(count(lit(1)).as("true_cnt"))
      // localCheckpoint, not cache: eager, lineage-truncating, and its
      // blocks are GC-cleaned when unreferenced — a library operator must
      // not leave session-lifetime cache entries behind (r9 cache-hygiene
      // pass; the connectedComponents precedent measured it faster too)
      .localCheckpoint()
    val hashed = keyCounts
      .select(col("k"), col("true_cnt"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", bucketCol(col("j"), col("k"), w))
    val counters = hashed
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("true_cnt")).as("cnt"))
    val probeHashes = keyCounts
      .orderBy(col("true_cnt").desc, col("k").asc)
      .limit(topK)
      .select(col("k"), col("true_cnt"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", bucketCol(col("j"), col("k"), w))
    probeHashes
      .join(counters, Seq("j", "bucket"))
      .groupBy(col("k").as(keyCol))
      .agg(
        first(col("true_cnt")).as("true_cnt"),
        min(col("cnt")).as("cms_est"))
  }
}
