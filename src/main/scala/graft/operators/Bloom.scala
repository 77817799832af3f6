package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational Bloom filter — the build/probe membership primitive behind
  * semi-join pruning, CDC key screens and blocklist checks, built so the
  * filter itself is engine-independent (the CMS discipline,
  * [[CountMin]]): k md5-derived hash positions per key, the bit array as
  * a DISTINCT position set.
  *
  * Scale shape: the build side collapses to ≤ m distinct set-bit rows
  * (the "bit array" — broadcastable at any corpus size once m is fixed);
  * probing is an explode to k rows and one broadcast join, counting
  * matched positions per probe — `hits = k ⇔ maybe-member`. No false
  * negatives by construction; false positives at the classic
  * (1 − e^(−kn/m))^k rate.
  */
object Bloom {

  private def posCol(j: Column, key: Column, m: Int): Column =
    pmod(
      conv(substring(md5(concat_ws("|", j, key)), 1, 8), 16, 10).cast("long"),
      lit(m.toLong))

  /** Probe verdicts summarized against ground truth: one row of
    * (n_probes, n_members, n_maybe, n_false_pos). The spec pins the
    * no-false-negative invariant per probe; this summary pins the whole
    * filter value-wise (every bit position, every verdict) through the
    * oracle replay.
    */
  def membershipSummary(
      build: DataFrame,
      probes: DataFrame,
      keyCol: String,
      m: Int = 4096,
      k: Int = 3
  ): DataFrame = {
    val key = col(keyCol)
    val js = explode(sequence(lit(0), lit(k - 1))).as("j")
    val bits = build
      .select(key.as("bk"), js)
      .select(posCol(col("j"), col("bk"), m).as("pos"))
      .distinct()
    val probeKeys = probes.select(key.as("pk")).distinct()
    val hits = probeKeys
      .select(col("pk"), js)
      .withColumn("pos", posCol(col("j"), col("pk"), m))
      // hint-free: the bit relation is ≤m rows but m is a caller
      // parameter (scaled with the build side at 100 TB); AQE decides
      .join(bits, Seq("pos"), "left_semi")
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("nhit"))
    val truth = build.select(key.as("pk")).distinct().withColumn("member", lit(true))
    probeKeys
      .join(hits, Seq("pk"), "left")
      .join(truth, Seq("pk"), "left")
      .select(
        col("pk"),
        (coalesce(col("nhit"), lit(0L)) === k).as("maybe"),
        coalesce(col("member"), lit(false)).as("member"))
      .agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("member"), 1L).otherwise(0L)).as("n_members"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("maybe") && !col("member"), 1L).otherwise(0L)).as("n_false_pos"))
  }
}
