package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication suite for a training-data pipeline, over the `documents`
  * and `embeddings` tables: exact (hash groupBy), MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every method is candidate-generation-first —
  * a cheap signature computed in one codegen'd scan, a bucket shuffle that
  * only collides plausible near-dups, and exact verification restricted to
  * candidate pairs. Nothing here ever materializes the O(n²) pair space.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups by content hash: keeper = min doc_id per group
    * (one hash-aggregate; at scale this is the classic first-pass dedup).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // ------------------------------------------------------------- shingles

  /** Distinct character n-gram shingle set per document (codegen'd HOF —
    * sequence/transform/array_distinct; no explode until the caller needs
    * one row per shingle).
    */
  def charShingles(docs: DataFrame, n: Int = 4): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      expr(
        s"array_distinct(transform(sequence(1, greatest(length(text) - ${n - 1}, 0)), i -> substring(text, i, $n)))"
      ).as("shingles")
    )

  /** Exact Jaccard over shingle sets for a pre-bucketed candidate pair
    * relation (columns doc_a, doc_b) — the verification kernel shared by
    * the brute-force and LSH paths.
    */
  private def verifyJaccard(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    pairs
      .join(a, "doc_a")
      .join(b, "doc_b")
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          6
        ).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Brute n-gram Jaccard within blocking groups (same lang): the exact
    * baseline. Quadratic inside a block — only viable when blocks are
    * small; [[minhashPairs]] is the scale path.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 4, threshold: Double = 0.35): DataFrame = {
    val sh = charShingles(docs, n).cache()
    val a = sh.select(col("lang"), col("doc_id").as("doc_a"))
    val b = sh.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, a("lang") === b("lang_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    verifyJaccard(pairs, sh, threshold)
  }

  // -------------------------------------------------------------- MinHash

  /** MinHash band signatures: `numPerm` seeded xxhash64 permutations
    * min-reduced per doc in ONE pass over the exploded shingles (partial
    * min aggregation map-side), then `bands` band-hashes of `numPerm/bands`
    * rows each. Output long format: (doc_id, band_id, band_sig).
    */
  def minhashBands(shingled: DataFrame, numPerm: Int = 64, bands: Int = 16): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val exploded = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val minAggs = (0 until numPerm).map(p => min(xxhash64(lit(p), col("sh"))).as(s"m$p"))
    val sigs = exploded.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { bnd =>
      xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"m$i")): _*)
    }
    sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_id", "band_sig")))
  }

  /** LSH candidate pairs: docs sharing any band bucket. One shuffle on
    * (band_id, band_sig); the self-join only collides within buckets.
    */
  def minhashCandidates(bandsDF: DataFrame): DataFrame = {
    val a = bandsDF.select(col("band_id"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = bandsDF.select(
      col("band_id").as("band_id_b"),
      col("band_sig").as("band_sig_b"),
      col("doc_id").as("doc_b")
    )
    a.join(
        b,
        col("band_id") === col("band_id_b") &&
          col("band_sig") === col("band_sig_b") &&
          col("doc_a") < col("doc_b")
      )
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → band bucket
    * join → exact-Jaccard verification of candidates only.
    */
  def minhashPairs(
      docs: DataFrame,
      n: Int = 4,
      numPerm: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.35
  ): DataFrame = {
    val sh = charShingles(docs, n).cache()
    val cands = minhashCandidates(minhashBands(sh, numPerm, bands))
    verifyJaccard(cands, sh, threshold)
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: tokens hashed, each hash bit votes ±1,
    * sign of the per-bit tally forms the signature. One explode + one
    * 64-column hash-aggregate (all partial map-side).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tokens = docs.select(
      col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok")
    )
    val h = xxhash64(col("tok"))
    val bitAggs = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit$j")
    }
    val tallies = tokens.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"bit$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    tallies.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, candidate
    * generation via 4 × 16-bit band buckets (a pair within Hamming 3 of 64
    * bits always shares at least one clean 16-bit band; wider distances
    * are found with decreasing recall — standard SimHash banding).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val sigs = simhashSignatures(docs).cache()
    val banded = sigs.select(
      col("doc_id"),
      col("simhash"),
      posexplode(
        array((0 until 4).map(b => shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*)
      ).as(Seq("band_id", "band_val"))
    )
    val a = banded.select(col("band_id"), col("band_val"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(
      col("band_id").as("band_id_b"),
      col("band_val").as("band_val_b"),
      col("doc_id").as("doc_b"),
      col("simhash").as("sim_b")
    )
    a.join(
        b,
        col("band_id") === col("band_id_b") &&
          col("band_val") === col("band_val_b") &&
          col("doc_a") < col("doc_b")
      )
      .select(
        col("doc_a"),
        col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- embedding-cosine near-dup

  /** Deterministic random hyperplanes: `tables` independent signatures of
    * `planesPerTable` sign-bits each (classic multi-table SRP-LSH — more
    * tables raises recall, more planes per table raises precision).
    */
  private[operators] def hyperplanes(
      dim: Int,
      tables: Int,
      planesPerTable: Int,
      seed: Long
  ): Seq[Seq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(planesPerTable)(Array.fill(dim)(rng.nextGaussian())))
  }

  /** Embedding near-dup pairs: SRP-LSH bucket join per table, union,
    * exact-cosine verification of candidates only.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      dim: Int = 64,
      threshold: Double = 0.30,
      tables: Int = 6,
      planesPerTable: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val vecD = VectorOps.toDouble(col("embedding"))
    val planes = hyperplanes(dim, tables, planesPerTable, seed)
    val sigCols = planes.zipWithIndex.map { case (tablePlanes, t) =>
      tablePlanes.zipWithIndex
        .map { case (p, i) =>
          val planeCol = array(p.map(lit): _*)
          when(VectorOps.dot(vecD, planeCol) >= 0, lit(1 << i)).otherwise(lit(0))
        }
        .reduce(_ + _)
        .as(s"sig$t")
    }
    val signed = embeddings
      .select(Seq(col("vec_id"), col("embedding")) ++ sigCols: _*)
      .cache()

    val candidates = (0 until tables)
      .map { t =>
        val a = signed.select(col(s"sig$t").as("s"), col("vec_id").as("id_a"))
        val b = signed.select(col(s"sig$t").as("sb"), col("vec_id").as("id_b"))
        a.join(b, col("s") === col("sb") && col("id_a") < col("id_b"))
          .select("id_a", "id_b")
      }
      .reduce(_ union _)
      .distinct()

    val va = signed.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val vb = signed.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    candidates
      .join(va, "id_a")
      .join(vb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        round(VectorOps.cosine(VectorOps.toDouble(col("v_a")), VectorOps.toDouble(col("v_b"))), 6)
          .as("cosine")
      )
      .filter(col("cosine") >= threshold)
  }
}
