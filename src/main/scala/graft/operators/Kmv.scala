package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values sketch (Bar-Yossef et al. '02 / Beyer et al. '07) —
  * the SET-OPERATIONS cardinality sketch: where [[Hll]] answers only
  * |S|, KMV's k smallest hash values support union, intersection and
  * Jaccard estimates BETWEEN sets, because the k-min values of A ∪ B are
  * computable from the two sketches alone and each surviving value's
  * membership in A and B is known. That is the primitive behind
  * "how many users did both X and Y" over sets far too large to
  * intersect exactly.
  *
  * Deterministic-sketch discipline (same as [[Hll]] / [[CountMin]] /
  * [[Bloom]]): hashes are md5-derived 60-bit uniforms, so a SQL oracle
  * reconstructs the IDENTICAL sketches, memberships and estimates —
  * the whole approximate structure is value-checked.
  *
  *   - sketch build: distinct (set, h) → per-set `row_number ≤ k` —
  *     rank-k selection under partial aggregation, the only
  *     corpus-sized work;
  *   - |S| estimate: (k−1)/u_k with u_k = h_k/2⁶⁰ (the classic
  *     unbiased KMV estimator); a sketch with fewer than k values IS
  *     the whole set, so the estimate is exact there;
  *   - pair (A,B): k-min of the merged sketches → union estimate; the
  *     fraction of survivors present in both input sketches estimates
  *     Jaccard; intersection = J · |A∪B|. All pair work is
  *     sketch-sized (sets × k rows), corpus-independent.
  */
object Kmv {

  /** 2⁶⁰ as the double both engines divide by (15 hex digits of md5). */
  private val TwoPow60: Double = 1152921504606846976.0

  /** md5-derived 60-bit hash value for a (stringified) key. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** All-pairs set comparison over `(setCol, keyCol)` membership rows.
    * Output per unordered pair (set_a < set_b): KMV size estimates for
    * both sets and their union, the Jaccard estimate, the intersection
    * estimate, and (verification rider, sample-scale only — at 100 TB a
    * deployment drops it and trusts the validated sketch) the exact
    * intersection.
    */
  def pairIntersections(
      df: DataFrame,
      setCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame = {
    require(k >= 2, "need k >= 2")
    val dh = df
      .select(col(setCol).cast("string").as("s"), hash60(col(keyCol)).as("h"))
      .distinct()
    // the sketch relation is sets×k rows and feeds four consumers —
    // checkpoint it so each branch does not re-scan the corpus
    val sk = dh
      .withColumn("rn", row_number().over(Window.partitionBy(col("s")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("s"), col("h"))
      .localCheckpoint()
    def kmvEst(nSk: Column, hK: Column): Column =
      when(nSk < k, nSk.cast("double"))
        .otherwise(lit(k - 1) / (hK / lit(TwoPow60)))
    val est = sk
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("h_k"))
      .select(col("s"), kmvEst(col("n_sk"), col("h_k")).as("est_s"))
    val pairs = est.select(col("s").as("sa"))
      .crossJoin(est.select(col("s").as("sb")))
      .filter(col("sa") < col("sb"))
    // merged k-min of the two sketches = the union's KMV
    val mg = pairs
      .join(sk, col("s") === col("sa")).select(col("sa"), col("sb"), col("h"))
      .unionAll(
        pairs.join(sk, col("s") === col("sb")).select(col("sa"), col("sb"), col("h")))
      .distinct()
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    val un = mg
      .join(
        sk.select(col("s").as("sa"), col("h"), lit(1).as("in_a")),
        Seq("sa", "h"), "left")
      .join(
        sk.select(col("s").as("sb"), col("h"), lit(1).as("in_b")),
        Seq("sb", "h"), "left")
      .groupBy(col("sa"), col("sb"))
      .agg(
        count(lit(1)).as("k_used"),
        max(col("h")).as("h_k"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L).otherwise(0L))
          .as("n_both"))
    val ex = dh.select(col("s").as("sa"), col("h"))
      .join(dh.select(col("s").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("exact_inter"))
    val estUnion = kmvEst(col("k_used"), col("h_k"))
    un
      .join(est.select(col("s").as("sa"), col("est_s").as("ea")), Seq("sa"))
      .join(est.select(col("s").as("sb"), col("est_s").as("eb")), Seq("sb"))
      .join(ex, Seq("sa", "sb"), "left")
      .select(
        col("sa").as("set_a"),
        col("sb").as("set_b"),
        round(col("ea"), 6).as("est_a"),
        round(col("eb"), 6).as("est_b"),
        round(estUnion, 6).as("est_union"),
        col("n_both"),
        round(col("n_both").cast("double") / col("k_used"), 6).as("jaccard_est"),
        round((col("n_both").cast("double") / col("k_used")) * estUnion, 6)
          .as("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }
}
