package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset curation: hash-based splits and samples.
  *
  * Training pipelines need splits that are STABLE — a document's
  * train/val/test assignment must not change when the corpus is
  * re-partitioned, re-ordered, grown, or re-processed on a different
  * cluster. Seeded `rand()` gives none of that (it is
  * partition-order-dependent); hashing the record's identity gives all
  * of it: `bucket = md5(id || salt) mod buckets` is a pure row-local
  * projection — no shuffle, no state, reproducible everywhere (and in
  * the DuckDB oracle). The salt lets different experiments draw
  * independent splits from the same corpus.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a record id and salt: the first
    * 8 md5 hex digits parsed as a long. Row-local, codegen'd, identical
    * across engines (md5 of the id's canonical string form).
    */
  def hashBucket(id: Column, buckets: Int, salt: String): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Assign every row a split label by hash bucket (of 1000):
    * `[0, trainPerMille)` → train, `[trainPerMille, trainPerMille +
    * valPerMille)` → val, rest → test. Fractions are exact in
    * expectation and — unlike `randomSplit` — the same row always lands
    * in the same split. A NULL id hashes to a null bucket and falls
    * through both `when` branches: null-id rows land deterministically
    * in `test` (they can never leak into training data).
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      salt: String = "v1",
      trainPerMille: Int = 900,
      valPerMille: Int = 50
  ): DataFrame = {
    require(trainPerMille + valPerMille <= 1000, "per-mille fractions exceed 1000")
    val b = hashBucket(col(idCol), 1000, salt)
    df.withColumn(
      "split",
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test")
    )
  }

  /** Deterministic ~`perMille`/1000 sample: keep rows whose bucket falls
    * below the threshold. Re-running, re-partitioning, or growing the
    * input never changes which surviving rows are kept.
    */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      perMille: Int,
      salt: String = "v1"
  ): DataFrame =
    df.filter(hashBucket(col(idCol), 1000, salt) < perMille)

  /** STRATIFIED deterministic sampling: each stratum value keeps its own
    * per-mille rate (strata absent from the map keep `defaultPerMille`).
    * The curation move behind corpus rebalancing — e.g. downsample the
    * dominant language, keep all of a rare one — with the same
    * stability guarantees as [[deterministicSample]]: the rate lookup
    * compiles to a row-local CASE (no join, no shuffle, null stratum →
    * default rate), so rebalancing a 100 TB corpus is a pure scan-side
    * filter.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      perMilleByStratum: Map[String, Int],
      defaultPerMille: Int = 1000,
      salt: String = "v1"
  ): DataFrame = {
    require((defaultPerMille +: perMilleByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 1000), "per-mille rates must be in [0, 1000]")
    // deterministic iteration order so the generated CASE is stable
    val threshold = perMilleByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
        when(col(strataCol) === k, lit(v)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol), 1000, salt) < threshold)
  }

  /** BALANCED downsampling: equalize strata to the smallest stratum's
    * size — the data-driven sibling of [[stratifiedSample]], for when
    * nobody knows the mixture up front (the usual case when flattening
    * a source/language skew in a fresh 100 TB crawl). Per-stratum keep
    * rate = `(1000 * min_n) div n_g` per-mille from one tiny aggregate
    * (|strata| rows, broadcast back — never a driver collect), applied
    * through the same row-local identity-hash filter as every sampler
    * here. Integer arithmetic throughout, so the rate table is exact
    * and engine-independent; the smallest stratum keeps rate 1000
    * (fully kept), and expected post-balance sizes are equal across
    * strata to within hash granularity.
    */
  def balancedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      salt: String = "v1"
  ): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__mn"))
    val rates = counts
      .crossJoin(broadcast(minN))
      .select(col(strataCol), expr("1000 * __mn div __n").as("__keep_pm"))
    // hint-free: the rate table is strata-keyed (data-dependent); AQE
    // picks the build side from runtime sizes
    df.join(rates, Seq(strataCol))
      .filter(hashBucket(col(idCol), 1000, salt) < col("__keep_pm"))
      .drop("__keep_pm")
  }

  /** Temperature-weighted mixture sampling — the LLM data-mixture
    * primitive (GPT-3/PaLM style): domain s is kept with probability
    * proportional to n_s^α / n_s, so α=1 reproduces the natural mix and
    * α→0 approaches uniform-over-domains; here α is fixed at 0.5
    * (sqrt weighting). `frac` scales the total target size.
    *
    * rate_pm(s) = min(1000, ⌊1000 · frac · N · √n_s / (Σ√n · n_s)⌋),
    * applied through the same row-local identity-hash filter as every
    * sampler here. The one float chain (√, ×, ÷ before the per-mille
    * floor) is kept textually parallel with the oracle; a floor flip
    * needs the true rate within an ulp of an integer per-mille — the
    * multi-SF sweep pins it (the q99 quantization-boundary posture).
    *
    * Returns the per-domain audit table (domain, n_docs, n_kept,
    * rate_pm) — the thing a pipeline logs; the kept rows themselves are
    * the same join+filter shape as [[balancedSample]].
    */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      frac: Double = 0.5,
      salt: String = "t1"
  ): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val totals = counts.agg(
      sum(col("__n")).as("__tot"),
      sum(sqrt(col("__n").cast("double"))).as("__sumw"))
    val rates = counts
      .crossJoin(broadcast(totals))
      .select(
        col(strataCol),
        col("__n"),
        least(
          lit(1000L),
          floor(
            lit(1000.0) * lit(frac) * col("__tot").cast("double") *
              sqrt(col("__n").cast("double")) /
              (col("__sumw") * col("__n").cast("double"))).cast("long"))
          .as("__keep_pm"))
    // hint-free: strata-keyed rate table, AQE resolves the build side
    df.join(rates, Seq(strataCol))
      .withColumn("__kept", hashBucket(col(idCol), 1000, salt) < col("__keep_pm"))
      .groupBy(col(strataCol))
      .agg(
        first(col("__n")).as("n_docs"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        first(col("__keep_pm")).as("rate_pm"))
  }

  /** EXACT-SIZE deterministic sample via order statistics: the n rows
    * with the smallest md5 priorities (id tie-break). Hash-threshold
    * samplers ([[splitAssign]]/[[balancedSample]]) give binomial sizes;
    * this gives exactly n — the "give me precisely 10k eval docs,
    * reproducibly" contract. Plans as TakeOrderedAndProject: per-partition
    * partial top-n, no global sort — the distributed reservoir.
    */
  def exactSample(df: DataFrame, idCol: String, n: Int, salt: String = "x1"): DataFrame = {
    require(n > 0, "n must be positive")
    val pri = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("__pri", pri)
      .orderBy(col("__pri").asc, col(idCol).asc)
      .limit(n)
      .drop("__pri")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirtakis '06
    * A-ES), deterministic: each row draws u ∈ (0,1) from its md5
    * (48 hash bits + ½, over 2⁴⁸ — an exact dyadic, never 0 or 1) and
    * the n rows with the smallest key `−ln(u)/w` win — exactly the
    * inclusion law of sequential weighted draws, but expressible as a
    * top-n, so it plans as TakeOrderedAndProject (per-partition partial
    * top-n, no global sort) and scales like [[exactSample]].
    *
    * Rows with non-positive weight are excluded (the A-ES key is
    * undefined there); ties break on id for engine-independence.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      salt: String = "w1"
  ): DataFrame = {
    require(n > 0, "n must be positive")
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 12), 16, 10)
      .cast("double")
    // 2^48; (h + 0.5) / 2^48 ∈ (0,1) exclusive, exactly representable
    val u = (h + 0.5) / lit(281474976710656.0)
    val key = -log(u) / col(weightCol)
    df.filter(col(weightCol) > 0)
      .withColumn("__k", key)
      .orderBy(col("__k").asc, col(idCol).asc)
      .limit(n)
      .drop("__k")
  }

  /** Deterministic GLOBAL SHUFFLE + sharding for training order: every
    * row gets a hash-derived sort key, a shard id (`hash mod shards`),
    * and its position within the shard (ascending hash, id tie-break).
    * The "random" training order is thus a pure function of (id, salt) —
    * reproducible across reruns, partitionings and engines, and a new
    * salt is a fresh epoch-level reshuffle.
    *
    * Position is per-shard `row_number`, so the only sort is within each
    * shard's partition (one hash shuffle on shard, ~n/shards rows each).
    * At 100 TB the writer would `repartitionByRange(shard, __h)` and let
    * each task stream its shard file in hash order — no global sort
    * either way.
    */
  /** SQRT-SMOOTHED per-source capping — the head-domain suppression a
    * web-corpus pipeline runs so a handful of giant sources cannot
    * dominate the training mixture (the CCNet/RefinedWeb move: cap per
    * domain sublinearly in its size, here `max(minKeep, ⌈c·√n_s⌉)`).
    * Within each source, rows are kept quality-first (`n_chars` desc,
    * id tie-break) up to the cap.
    *
    * ONE shuffle total: `row_number` and `count(*)` share the same
    * source-keyed window partitioning, so the cap is derived inside the
    * window pass — no separate counts aggregate, no join back. The
    * retention summary then reuses the already source-partitioned rows
    * (map-side agg, no second exchange of the corpus). At 100 TB the
    * one caveat is a mega-source whose rows exceed an executor's window
    * partition: pre-aggregate that source's ids by a salted sub-key and
    * rank in two levels (same spill posture as any sessionize window).
    *
    * Output per source: (source, n_docs, cap, n_kept, chars_total,
    * chars_kept, kept_frac).
    */
  def sqrtSourceCap(
      docs: DataFrame,
      c: Double = 4.0,
      minKeep: Long = 10L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(c > 0 && minKeep >= 0, "need c > 0, minKeep >= 0")
    val bySource = Window.partitionBy(col("source"))
    val rank = Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(rank))
      .withColumn("n_docs", count(lit(1)).over(bySource))
      .withColumn(
        "cap",
        greatest(lit(minKeep), ceil(lit(c) * sqrt(col("n_docs").cast("double")))))
      .groupBy(col("source"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("cap")).as("cap"),
        sum(when(col("rn") <= col("cap"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_chars")).as("chars_total"),
        sum(when(col("rn") <= col("cap"), col("n_chars")).otherwise(0L)).as("chars_kept"))
      .select(
        col("source"), col("n_docs"), col("cap"), col("n_kept"),
        col("chars_total"), col("chars_kept"),
        round(col("chars_kept") / col("chars_total"), 6).as("kept_frac"))
  }

  /** LARGEST-REMAINDER (Hamilton) apportionment of an exact row budget
    * across strata: quotas `budget·n_s/total`, floors, then the
    * remaining seats to the largest fractional parts (stratum-name
    * tie-break). Where [[temperatureSample]] computes sampling RATES,
    * this computes integer COUNTS that sum to exactly `budget` — the
    * "allocate 10B tokens across domains" planning step of a mixture
    * build, whose output feeds a per-stratum exact sampler like
    * [[exactSample]]. One corpus-scan count; everything after is
    * strata-sized.
    *
    * Output: (groupCol, n_s, alloc) with Σ alloc = min(budget, total
    * when every stratum caps out — quotas never exceed n_s only if
    * budget ≤ total, the intended regime).
    */
  def largestRemainderAlloc(
      df: DataFrame,
      groupCol: String,
      budget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be nonnegative")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum(col("n_s")).as("total"))
    val q = counts
      .crossJoin(broadcast(tot))
      .withColumn("quota", lit(budget) * col("n_s") / col("total"))
      .withColumn("base", floor(col("quota")).cast("long"))
      .withColumn("frac", col("quota") - col("base"))
    val deficit = q.agg((lit(budget) - sum(col("base"))).as("deficit"))
    q.crossJoin(broadcast(deficit))
      .withColumn(
        "rn",
        row_number().over(Window.orderBy(col("frac").desc, col(groupCol).asc)))
      .select(
        col(groupCol),
        col("n_s"),
        (col("base") + when(col("rn") <= col("deficit"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Neyman-optimal stratified allocation: split a sampling `budget`
    * across strata ∝ N_h·σ_h — the minimum-variance design, which
    * oversamples big AND volatile strata where proportional allocation
    * ([[largestRemainderAlloc]]) only sees size. With integer-cent
    * values, N_h·σ_h = √(N_h·Σc² − (Σc)²) exactly, so each stratum's
    * weight is ONE sqrt of an exact long; integerization is the same
    * largest-remainder step (exact Σ = budget). Two strata-sized aggs,
    * one broadcast total.
    *
    * Output per stratum: (stratum, n_rows, sigma, alloc).
    */
  def neymanAlloc(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      budget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be nonnegative")
    val moments = df
      .select(col(groupCol), expr(s"CAST(round($valCol * 100) AS BIGINT)").as("c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_s"), sum(col("c")).as("sc"), sum(col("c") * col("c")).as("sc2"))
      .withColumn("w", sqrt((col("n_s") * col("sc2") - col("sc") * col("sc")).cast("double")))
      .localCheckpoint() // strata-sized; consumed by the total and the quota pass
    val tot = moments.agg(sum(col("w")).as("wtot"))
    val q = moments
      .crossJoin(broadcast(tot))
      .withColumn("quota", lit(budget.toDouble) * col("w") / col("wtot"))
      .withColumn("base", floor(col("quota")).cast("long"))
      .withColumn("frac", col("quota") - col("base"))
    val deficit = q.agg((lit(budget) - sum(col("base"))).as("deficit"))
    q.crossJoin(broadcast(deficit))
      .withColumn(
        "rn",
        row_number().over(Window.orderBy(col("frac").desc, col(groupCol).asc)))
      .select(
        col(groupCol),
        col("n_s").as("n_rows"),
        round(col("w") / col("n_s").cast("double") / 100.0, 6).as("sigma"),
        (col("base") + when(col("rn") <= col("deficit"), 1L).otherwise(0L)).as("alloc"))
  }

  def shardAssign(df: DataFrame, idCol: String, shards: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards > 0, "shards must be positive")
    // 15 hex digits = 60 bits: fits a long with headroom, same
    // cross-engine md5 contract as hashBucket
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
      .withColumn(
        "pos",
        row_number()
          .over(Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol)))
          .cast("long"))
      .drop("__h")
  }

  /** Dedup-aware (cluster-weighted) sampling: keep each document with
    * probability 1/|its duplicate cluster| — in expectation one
    * representative per cluster, so over-represented near-duplicate
    * content stops dominating the training mix WITHOUT the hard
    * keep-exactly-one cut (soft dedup, the mix-rebalancing knob next to
    * [[sqrtSourceCap]]).
    *
    * The draw is exact integer arithmetic: the md5-dyadic 32-bit
    * uniform u keeps the row iff u·|cluster| < 2³² — no float
    * probabilities, replayable anywhere. Docs absent from `clusters`
    * (non-duplicates) are singletons and always kept. Output is the
    * per-cluster-size audit (size, clusters, docs, kept) — kept ≈
    * clusters is the expectation a mix report checks.
    */
  def clusterWeightedSample(
      docs: DataFrame,
      clusters: DataFrame,
      salt: String = "csample"
  ): DataFrame = {
    val m = docs
      .select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_rep"), col("doc_id")).as("cluster"))
    val sizes = m.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
    m.join(sizes, Seq("cluster"))
      .withColumn(
        "u",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))), 1, 8), 16, 10)
          .cast("long"))
      .groupBy(col("csize").as("cluster_size"))
      .agg(
        countDistinct(col("cluster")).as("n_clusters"),
        count(lit(1)).as("n_docs"),
        sum(when(col("u") * col("csize") < 4294967296L, 1L).otherwise(0L)).as("n_kept"))
  }
}
