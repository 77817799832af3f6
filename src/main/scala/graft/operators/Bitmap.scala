package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational BITMAP INDEX over an integer id domain — the audience-
  * segmentation primitive: represent each segment's id set as 64-bit
  * words (word = id >> 6, bit = id & 63, OR-aggregated), then answer
  * set algebra (cardinality, pairwise intersection/union, containment)
  * with `bit_count` on word-aligned joins. The raw id lists never
  * travel again after the one build pass: a 10⁹-id segment is ~16 M
  * words, and every pairwise question is an equi-join on word id —
  * this is the roaring-bitmap posture expressed in pure relational
  * operators (dense words only; a production bitmap adds run/array
  * containers, which change constants, not the shuffle shape).
  *
  * Duplicate ids are absorbed by OR's idempotence — no pre-distinct
  * shuffle is needed, so the build is ONE keyed aggregate.
  *
  * All arithmetic is integer (shift/AND/OR/popcount); results are
  * exact on any engine, partitioning, or retry.
  */
object Bitmap {

  /** Per-segment bitmap words: (segment, wid, w). Words hold 63 bits,
    * not 64: bit 63 is the sign bit, and engines with CHECKED shifts
    * (DuckDB, ANSI-strict modes) reject `1 << 63` as signed overflow —
    * sign-free words keep every shift, AND, and popcount portable for
    * one bit of density.
    */
  def build(df: DataFrame, segCol: String, idCol: String): DataFrame =
    df.select(
        col(segCol).as("segment"),
        // FLOOR division, not `div` (which truncates toward zero): with
        // truncation id −1 would land on (wid 0, bit 62) and collide with
        // id 62. wid = (id − pmod(id,63)) / 63 pairs wid with the
        // non-negative pmod bit for ANY sign, matching a floor-div oracle.
        expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), 63)) div 63").as("wid"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod($idCol, 63) AS INT))").as("b"))
      .groupBy(col("segment"), col("wid"))
      .agg(expr("bit_or(b)").as("w"))

  /** Pairwise segment overlap report from one bitmap build:
    * (seg_a, seg_b, n_a, n_b, n_and, n_or, jaccard) for seg_a < seg_b.
    */
  def intersections(df: DataFrame, segCol: String, idCol: String): DataFrame = {
    val words = build(df, segCol, idCol).localCheckpoint()
    val cards = words
      .groupBy(col("segment"))
      .agg(sum(bit_count(col("w")).cast("long")).as("card"))
    val pairs = words.select(col("segment").as("seg_a"), col("wid"), col("w").as("wa"))
      .join(
        words.select(col("segment").as("seg_b"), col("wid"), col("w").as("wb")),
        Seq("wid"))
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(sum(bit_count(col("wa").bitwiseAND(col("wb"))).cast("long")).as("n_and"))
    pairs
      .join(cards.select(col("segment").as("seg_a"), col("card").as("n_a")), Seq("seg_a"))
      .join(cards.select(col("segment").as("seg_b"), col("card").as("n_b")), Seq("seg_b"))
      .select(
        col("seg_a"), col("seg_b"), col("n_a"), col("n_b"), col("n_and"),
        (col("n_a") + col("n_b") - col("n_and")).as("n_or"),
        round(
          col("n_and").cast("double") / (col("n_a") + col("n_b") - col("n_and")),
          6).as("jaccard"))
  }
}
