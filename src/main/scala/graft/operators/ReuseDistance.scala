package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact LRU miss-ratio curve from reuse distances — the Mattson stack
  * algorithm done relationally. For every re-access of a key, the
  * REUSE DISTANCE is the number of distinct OTHER keys touched since
  * that key's previous access; under LRU, the access hits a cache of
  * capacity C iff distance < C, so one pass over distances yields the
  * whole hit-rate-vs-capacity curve (the MRC every cache-sizing
  * decision reads).
  *
  * Plan shape: the classic algorithm walks the trace with a balanced
  * tree — inherently sequential. Here each re-access becomes the
  * position interval (prev+1, pos−1), intervening accesses attach via
  * the engine's BINNED point-in-interval join ([[RangeJoin]] — no
  * nested loop), and a distinct-count per interval gives the
  * distance. Total joined rows = Σ gap lengths ≈ n·(n/keys) — linear
  * in trace length for a fixed key population. The global position
  * index is a distributed rank (time-range buckets + broadcast
  * exclusive prefix counts + keyed intra-bucket row_number — the
  * Packing.scala prefix-sum shape), so no stage drags the trace
  * through one task; everything downstream is keyed.
  *
  * Output: one row per capacity — (cache_size, n_accesses, n_cold,
  * n_hits, hit_rate) with cold (first-touch) misses counted in the
  * denominator.
  */
object ReuseDistance {

  /** @param sampleMod SHARDS spatial sampling rate R (Waldspurger et
    *   al., "Efficient MRC Construction with SHARDS"): keep only keys
    *   with hash(key) ≡ 0 (mod R), compute distances on the sampled
    *   trace, and scale each distance by R before the capacity
    *   compare. R = 1 is the exact curve; R > 1 cuts the dominant
    *   interval-join work by ~R² and is THE published way to run MRC
    *   at trace scale — hit rates are unbiased over sampled accesses.
    */
  /** Global (key, position) index over the sampled trace, positions
    * dense 1..n in (ts, event_id) order — a DISTRIBUTED RANK (the
    * Packing.scala prefix-sum shape), not a single-partition
    * row_number: time-range buckets are order-preserving (every access
    * in bucket b precedes every access in bucket b+1 because `us` is
    * the primary sort key), so pos = broadcast bucket offset + KEYED
    * intra-bucket row_number. The only unpartitioned window runs over
    * the ~targetBuckets-row bucket-count relation. Ties in `us` share
    * a bucket, so the (us, event_id) total order is preserved exactly.
    * Exposed so PlanAuditSpec can assert the shape pre-checkpoint.
    */
  def positionIndex(events: DataFrame, keyCol: String, sampleMod: Int): DataFrame = {
    val base = events
      .select(col(keyCol).as("k"), col("event_id"), unix_micros(col("ts")).as("us"))
      // md5-derived key sampling (not xxhash64) so a relational oracle
      // can replay the sampled key set exactly
      .filter(
        pmod(conv(substring(md5(concat(col("k").cast("string"), lit(":shards"))), 1, 8),
          16, 10).cast("long"), lit(sampleMod.toLong)) === 0L)
    val Array(r) = base.agg(min(col("us")), max(col("us"))).na.fill(0L).collect()
    val (minUs, maxUs) = (r.getLong(0), r.getLong(1))
    val targetBuckets = 1024L
    val binUs = math.max(1L, (maxUs - minUs) / targetBuckets + 1L)
    // integral div, not Column `/` (double) — exact bucket edges at any magnitude
    val bucketed = base.withColumn("bucket", expr(s"(us - ${minUs}L) div ${binUs}L"))
    val wOff = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col("bucket")).agg(count(lit(1)).as("bc"))
      .select(col("bucket"), coalesce(sum(col("bc")).over(wOff), lit(0L)).as("offset"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("us"), col("event_id"))
    bucketed
      .join(broadcast(offsets), "bucket")
      .withColumn("pos", (col("offset") + row_number().over(wIn)).cast("long"))
      .select(col("k"), col("pos"))
  }

  def missRatioCurve(
      events: DataFrame,
      keyCol: String = "user_id",
      cacheSizes: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L),
      sampleMod: Int = 1
  ): DataFrame = {
    require(cacheSizes.nonEmpty, "need at least one capacity")
    require(sampleMod >= 1, "sampleMod must be >= 1")
    val ordered = positionIndex(events, keyCol, sampleMod)
      .localCheckpoint() // consumed as both the re-access and the point side
    val withPrev = ordered
      .withColumn("prev", lag(col("pos"), 1).over(Window.partitionBy(col("k")).orderBy(col("pos"))))
    val re = withPrev.filter(col("prev").isNotNull)
    val gaps = re.filter(col("pos") - col("prev") >= 2)
      .select(col("pos").as("acc"), (col("prev") + 1L).as("lo"), (col("pos") - 1L).as("hi"))
    val pts = ordered.select(col("pos").as("pt"), col("k").as("u"))
    val bin = math.max(1L, RangeJoin.autoBinSize(gaps, "lo", "hi"))
    val dists = RangeJoin
      .pointInInterval(pts, gaps, "pt", "lo", "hi", bin)
      .groupBy(col("acc"))
      .agg(countDistinct(col("u")).as("d"))
      .select(col("d"))
      .unionByName(re.filter(col("pos") - col("prev") === 1).select(lit(0L).as("d")))
    val counts = withPrev.agg(
      count(lit(1)).as("n_accesses"),
      count(col("prev")).as("n_re"))
      .withColumn("n_cold", col("n_accesses") - col("n_re"))
    // scan-side fan: each distance row explodes into the (small) size
    // list — no cross join, no cartesian in the plan; under SHARDS the
    // sampled distance estimates the full-trace distance as d·R
    dists
      .withColumn("cache_size", explode(lit(cacheSizes.toArray)))
      .groupBy(col("cache_size"))
      .agg(sum(when(col("d") * lit(sampleMod.toLong) < col("cache_size"), 1L)
        .otherwise(0L)).as("n_hits"))
      .crossJoin(broadcast(counts))
      .select(
        col("cache_size"), col("n_accesses"), col("n_cold"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_accesses").cast("double"), 6)
          .as("hit_rate"))
  }
}
