package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. '07) distinct-count sketch, built
  * RELATIONALLY with md5-derived hashes so the register state — not just
  * the estimate — is engine-independent and oracle-replayable (the same
  * deterministic-sketch discipline as [[CountMin]] / [[Bloom]]):
  *
  *   - register index = `md5(key)[0,8) % m`, rank input = `md5(key)[8,16)`
  *     as a 32-bit value; ρ = leading-zero count + 1 computed EXACTLY as
  *     `33 - length(bin(w))` — integer string-length arithmetic, no
  *     float log2 that could flip at powers of two;
  *   - the register array is one `groupBy (group, bucket) max(ρ)` over
  *     DISTINCT keys; partial aggregation collapses each partition to
  *     ≤ m rows before the shuffle, and two shard sketches MERGE by
  *     register-wise max — the property that makes HLL (not exact
  *     countDistinct) the cardinality primitive at 100 TB;
  *   - `Σ 2^−Mj` is a sum of dyadic rationals spanning < 52 bits of
  *     exponent, so it is EXACT in double regardless of aggregation
  *     order — the estimate differs from the oracle only at the final
  *     ln/division ulp, absorbed by round(…,6).
  *
  * Standard small-range correction: linear counting `m·ln(m/V)` when the
  * raw estimate ≤ 2.5m and some register is empty. Absent registers never
  * need a zero-fill join: they contribute exactly `V · 2⁻⁰ = V` to the
  * harmonic sum and `V` is arithmetic (`m − count(present)`).
  */
object Hll {

  /** md5-derived register index for a (stringified) key. */
  def bucketCol(keyStr: Column, m: Int): Column =
    pmod(conv(substring(md5(keyStr), 1, 8), 16, 10).cast("long"), lit(m.toLong))

  /** Exact integer ρ (leading-zero rank) for a (stringified) key. */
  def rhoCol(keyStr: Column): Column = {
    val w32 = conv(substring(md5(keyStr), 9, 8), 16, 10).cast("long")
    when(w32 === 0, lit(33)).otherwise(lit(33) - length(bin(w32)))
  }

  /** The read-time half of the sketch: harmonic estimate from a register
    * relation (group, bucket, mj) — what a serving layer runs over
    * registers maintained elsewhere (shard merges, streaming state, a
    * lake table of per-partition sketches). Duplicate keys never need
    * de-duplication upstream: `max(ρ)` is multiset-invariant, which is
    * what lets a STREAM maintain the registers with one stateful agg and
    * no distinct. Output: (group, hll_est, v_zero).
    */
  def estimateFromRegisters(regs: DataFrame, groupCol: String, m: Int): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    val sp = col("sp")
    val np = col("np")
    val rawEst = alpha * m * m / (sp + (lit(m) - np))
    regs
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("np"),
        sum(pow(lit(2.0), -col("mj"))).as("sp"))
      .select(
        col(groupCol),
        round(
          when(rawEst <= 2.5 * m && np < m, lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - np)))
            .otherwise(rawEst),
          6).as("hll_est"),
        (lit(m) - np).cast("int").as("v_zero"))
  }

  /** Per-group distinct-count estimate next to the exact count (the
    * verification pairing a deployment runs at sample scale to validate
    * the sketch before trusting it corpus-wide). Output per group:
    * (group, exact_distinct, hll_est, v_zero).
    */
  def distinctSketch(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      m: Int = 512
  ): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val keyStr = col(keyCol).cast("string")
    val bucket = bucketCol(keyStr, m)
    val rho = rhoCol(keyStr)
    // One scan: distinct (group, key) → per-key (bucket, ρ) → registers.
    // Exact counts ride along as count-per-bucket so no second pass over
    // the base table is needed.
    val regs = df
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("_dup"))
      .select(col(groupCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("mj"), count(lit(1)).as("nk"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    val sp = col("sp")
    val np = col("np")
    val rawEst = alpha * m * m / (sp + (lit(m) - np))
    regs
      .groupBy(col(groupCol))
      .agg(
        sum(col("nk")).as("exact_distinct"),
        count(lit(1)).as("np"),
        sum(pow(lit(2.0), -col("mj"))).as("sp"))
      .select(
        col(groupCol),
        col("exact_distinct"),
        round(
          when(rawEst <= 2.5 * m && np < m, lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - np)))
            .otherwise(rawEst),
          6).as("hll_est"),
        (lit(m) - np).cast("int").as("v_zero"))
  }
}
