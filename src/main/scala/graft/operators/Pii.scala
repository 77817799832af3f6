package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every training-data
  * pipeline runs before a corpus ships: find emails / IPv4 addresses /
  * SSN-shaped ids, replace them with typed placeholder tags, and report
  * per-document match counts so the pipeline can quarantine PII-dense
  * documents instead of just masking them.
  *
  * Row-local by construction (regexp_replace / regexp_count inside one
  * codegen'd projection — no UDF, no shuffle): at 100 TB this runs at
  * scan speed and composes with the quality gates in [[Checks]].
  *
  * Patterns deliberately use the regex subset shared by Java's engine and
  * RE2 (character classes, bounded repetition — no backreferences or
  * lookarounds), so the same rules are portable to other engines and an
  * oracle can replay them.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Add `n_email`, `n_ip`, `n_ssn` counts and a `redacted` text column
    * (emails replaced first: an email's host part must not be re-matched
    * as a bare hostname by later rules).
    */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", regexp_count(t, lit(EmailRe)))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)))
      .withColumn("n_ssn", regexp_count(t, lit(SsnRe)))
      .withColumn(
        "redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re,
            "<IP>"),
          SsnRe,
          "<SSN>")
      )
  }

  /** k-anonymity / l-diversity audit over a quasi-identifier tuple —
    * "can rows be re-identified by joining on what's left after
    * redaction?": rows whose QI equivalence class has fewer than k
    * members are re-identification risks; classes whose SENSITIVE
    * attribute takes < l distinct values leak it even at k (the homogeneity
    * attack l-diversity closes).
    *
    * Pure relational: one QI-keyed agg (count + distinct-sensitive), one
    * rollup to the reporting dimension. Exact integers; the pct is one
    * division.
    *
    * Output per `reportCol` value: (report, n_rows, n_classes,
    * n_small_classes, n_risky_rows, risky_row_pct, min_l).
    */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitiveCol: Column,
      reportCol: String,
      k: Int = 5,
      l: Int = 2
  ): DataFrame = {
    require(k >= 2 && l >= 1, "need k >= 2, l >= 1")
    val classes = df
      .groupBy(col(reportCol) +: quasiCols: _*)
      .agg(
        count(lit(1)).as("class_n"),
        countDistinct(sensitiveCol).as("class_l"))
    classes
      .groupBy(col(reportCol))
      .agg(
        sum(col("class_n")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("class_n") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("class_n") < k, col("class_n")).otherwise(0L)).as("n_risky_rows"),
        min(col("class_l")).as("min_l"))
      .withColumn(
        "risky_row_pct",
        round(col("n_risky_rows").cast("double") / col("n_rows").cast("double") * 100.0, 6))
      .select(
        col(reportCol), col("n_rows"), col("n_classes"), col("n_small_classes"),
        col("n_risky_rows"), col("risky_row_pct"), col("min_l"))
  }

  /** Differentially-private release of keyed counts via the DISCRETE
    * Laplace mechanism at ε = ln 2: each cell's count is perturbed by
    * two-sided geometric noise X = s·G with P(G = g) ∝ 2⁻ᵍ, which is
    * exactly the geometric mechanism of Ghosh–Roughgarden–Sundararajan
    * ("Universally Utility-Maximizing Privacy Mechanisms") for
    * sensitivity-1 counting queries.
    *
    * Engine-defined seed contract (the [[graft.sim.SimCore]] /
    * Poisson-bootstrap posture): the noise for a cell is derived from
    * md5(cell key ‖ salt) — G is the LEADING-ZERO COUNT of the first
    * 32-bit digest word (a fair-coin geometric: each leading bit is an
    * independent coin), the sign is the parity of the second word.
    * Everything is INTEGER arithmetic (`length(bin(k))` — no log/exp
    * float calls), so a relational oracle replays the released counts
    * bit-identically — no boundary-ulp residual risk at all, unlike
    * inverse-CDF float sampling.
    *
    * Seeded noise is for REPLAY/testing; a production release would
    * draw G from a CSPRNG per cell — the mechanism and the integer
    * sampler are unchanged, only the bit source differs (documented
    * deviation, same posture as the simulator's SplitMix64 contract).
    *
    * Scale shape: one keyed count agg, then a row-local projection on
    * the (small) released table — noise work is O(cells), not O(rows).
    *
    * Output: (key columns, true_n, noise, released_n) — `true_n`
    * retained because this is the pipeline-side audit view (utility
    * loss measurement); only (key, released_n) would leave the
    * boundary.
    */
  def dpNoisyCounts(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String = "dp"
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keyExpr = concat_ws("", keyCols.map(c => col(c).cast("string")): _*)
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("true_n"))
    // k1 ∈ [0, 2^32): leading zeros = 32 - length(bin(k1)); bin(0) = "0"
    // (length 1 → 31), so the all-zero word is special-cased to G = 32.
    val k1 = conv(expr("substring(digest, 1, 8)"), 16, 10).cast("long")
    val k2 = conv(expr("substring(digest, 9, 8)"), 16, 10).cast("long")
    counts
      .withColumn("digest", md5(concat(keyExpr, lit(":" + salt))))
      .withColumn("g", when(k1 === 0L, 32L).otherwise(lit(32L) - length(bin(k1))))
      .withColumn("noise", when(k2 % 2 === 0L, col("g")).otherwise(-col("g")))
      .select(keyCols.map(col) ++ Seq(
        col("true_n"), col("noise"), (col("true_n") + col("noise")).as("released_n")): _*)
  }
}
