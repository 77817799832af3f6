package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet lake sink — the write side of the 100 TB posture.
  *
  * Layout levers, each load-bearing at scale:
  *   - `partitionBy` on low-cardinality predicate columns → directory
  *     pruning: a reader filtering on them never lists, let alone scans,
  *     the other partitions (PlanAuditSpec pins `PartitionFilters` in the
  *     read plan).
  *   - `sortWithinPartitions` on the secondary predicate column → parquet
  *     row-group min/max stats become selective, so even intra-partition
  *     reads skip pages.
  *   - `maxRecordsPerFile` bounds file size so a 1000-executor read
  *     parallelizes without mammoth-file stragglers; `repartition` on the
  *     partition columns before the write avoids the
  *     every-task-writes-every-partition small-file explosion (tasks ×
  *     partitions files otherwise).
  */
object LakeWriter {

  /** Write `df` as a partitioned, sorted, size-bounded parquet table.
    *
    * `bloomFilterCols` adds a parquet BLOOM FILTER per listed column
    * (`parquet.bloom.filter.enabled#<col>`): point lookups on a
    * high-cardinality non-sort column (an id probe on a time-sorted
    * table) can then skip row groups that min/max stats cannot — min/max
    * on an unsorted id column spans nearly the full domain in every
    * group, so only the bloom filter's membership bits prune. Costs a few
    * KB per column per row group; worth it exactly for id-shaped probe
    * columns, wasted on low-cardinality or sorted ones.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L,
      bloomFilterCols: Seq[String] = Nil
  ): Unit = {
    val arranged = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = arranged.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val withBlooms = bloomFilterCols.foldLeft(writer)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    withBlooms
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Events re-laid-out for the lake: partitioned by (event_type, day),
    * sorted by ts within each partition — the layout every per-type /
    * per-day query in the catalogue would want at scale.
    */
  def writeEventsLake(spark: SparkSession, sfDir: String, outPath: String): Unit = {
    val events = Tables
      .events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    writePartitioned(events, outPath, Seq("event_type", "event_date"), Seq("ts"))
  }

  // ------------------------------------------------------------- Z-order

  /** Morton (Z-order) value of pre-bucketed dimensions: bit `i` of column
    * `c` lands at position `i * nCols + c` of the interleaved value. Pure
    * Column arithmetic (shifts/masks/sum) — whole-stage-codegen'd, no UDF.
    * Inputs must already be long bucket ids in `[0, 2^bits)`.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 62,
      "need 1+ columns and bits*nCols <= 62")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ + _)
  }

  /** Write `df` clustered on the Z-order curve over `zCols` — the
    * multi-dimensional analogue of `sortWithinPartitions`: a linear sort
    * gives perfect file-level min/max locality on the FIRST sort column
    * and none on the rest; the space-filling curve bounds every file's
    * min/max box on EVERY z column, so parquet row-group stats (and a
    * lake format's file stats) can skip data for predicates on any of
    * them.
    *
    * Columns are quantized to `bits`-bit equal-width buckets over their
    * observed [min, max] (one small agg job; no global sort, no driver
    * collect beyond 2 values per column). Equal-width keeps the bucketing
    * a pure scan-side expression; heavily skewed dimensions should be
    * pre-transformed (e.g. log) by the caller, as with any equal-width
    * histogram. `repartitionByRange` on the z-value both clusters and
    * load-balances the write (range exchange samples the distribution).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int = 12,
      numFiles: Int = 0,
      maxRecordsPerFile: Long = 1000000L
  ): Unit = {
    val statExprs = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val buckets = 1 << bits
    val bucketed = zCols.zipWithIndex.map { case (c, i) =>
      // empty input / all-NULL column → NULL min/max: degenerate dimension,
      // same as the constant-column case (getDouble would NPE)
      if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1)) lit(0L)
      else {
      val mn = stats.getDouble(2 * i)
      val mx = stats.getDouble(2 * i + 1)
      // degenerate (constant) dimension → bucket 0
      if (mx <= mn) lit(0L)
      else
        least(
          lit(buckets.toLong - 1),
          greatest(
            lit(0L),
            floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * buckets).cast("long")
          )
        )
      }
    }
    val withZ = df.withColumn("__z", zValue(bucketed, bits))
    val arranged =
      (if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
       else withZ.repartitionByRange(col("__z")))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    arranged.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Hilbert-curve index of two bucketized dimensions — the
    * locality-preserving alternative to [[zValue]]: consecutive curve
    * positions are always grid-adjacent (Z-order jumps at power-of-two
    * seams), so range boxes touch fewer distinct file ranges and
    * min/max row-group pruning skips more. Backed by the compiled
    * [[graft.functions.HilbertIndex]] Catalyst expression — the
    * per-level recurrence is a generated LOOP; a pure Column unroll
    * duplicates subtrees exponentially and OOMs the analyzer at
    * useful bit depths.
    *
    * Inputs must already be bucketized to [0, 2^bits). Returns the
    * curve position in [0, 4^bits).
    */
  def hilbertValue(xIn: Column, yIn: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits in [1,16]")
    graft.functions.HilbertIndex.register(SparkSession.active)
    call_function("hilbert_index", xIn.cast("long"), yIn.cast("long"), lit(bits))
  }

  /** Hilbert-clustered rewrite of `df` on two numeric columns — same
    * contract as [[writeZOrdered]] (equal-width bucketing from one
    * min/max pass, range-partitioned sorted write), but ordered along
    * the Hilbert curve for strictly better locality on 2-D range
    * predicates.
    */
  def writeHilbert(
      df: DataFrame,
      path: String,
      hCols: Seq[String],
      bits: Int = 8,
      numFiles: Int = 0,
      maxRecordsPerFile: Long = 1000000L
  ): Unit = {
    require(hCols.size == 2, "hilbert layout is two-dimensional")
    val statExprs = hCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val buckets = 1 << bits
    val bucketed = hCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1)) lit(0L)
      else {
        val mn = stats.getDouble(2 * i)
        val mx = stats.getDouble(2 * i + 1)
        if (mx <= mn) lit(0L)
        else
          least(
            lit(buckets.toLong - 1),
            greatest(
              lit(0L),
              floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * buckets).cast("long")))
      }
    }
    val withH = df.withColumn("__h", hilbertValue(bucketed(0), bucketed(1), bits))
    val arranged =
      (if (numFiles > 0) withH.repartitionByRange(numFiles, col("__h"))
       else withH.repartitionByRange(col("__h")))
        .sortWithinPartitions(col("__h"))
        .drop("__h")
    arranged.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Hash-bucketed layout: rows land in `numBuckets` directories by
    * `pmod(xxhash64(key), numBuckets)` — the metastore-free equivalent
    * of `bucketBy` (Spark's own bucketed tables need a catalog; a lake
    * path does not). A key-set probe then reads ONLY the matching
    * bucket directories (static partition pruning on the `__bucket`
    * dir column), so a point lookup touches 1/numBuckets of the table
    * regardless of total size — the layout every id-probe workload
    * wants at 100 TB. Within each bucket, rows are sorted by the key so
    * row-group min/max stats prune further inside the directory.
    */
  def writeBucketed(
      df: DataFrame,
      path: String,
      bucketCol: String,
      numBuckets: Int = 16
  ): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    writePartitioned(
      df.withColumn("__bucket", pmod(xxhash64(col(bucketCol)), lit(numBuckets.toLong)).cast("int")),
      path,
      partitionCols = Seq("__bucket"),
      sortCols = Seq(bucketCol))
  }

  /** Bucket-pruned key probe against a [[writeBucketed]] layout: maps
    * the key set to its bucket ids (tiny local job — the probe set is
    * driver-sized by definition), then scans only those directories and
    * semi-joins the keys. The returned frame's scan reads
    * |distinct buckets| / numBuckets of the table's files.
    */
  def readBucketedProbe(
      spark: SparkSession,
      path: String,
      bucketCol: String,
      keys: Seq[Long],
      numBuckets: Int = 16
  ): DataFrame = {
    import spark.implicits._
    val keyDf = keys.toDF(bucketCol)
    val buckets = keyDf
      .select(pmod(xxhash64(col(bucketCol)), lit(numBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(path)
      .filter(col("__bucket").isin(buckets: _*))
      .join(broadcast(keyDf), Seq(bucketCol), "left_semi")
      .drop("__bucket")
  }

  /** EXPECTATIONS-GATED write with a QUARANTINE lane (the Delta Live
    * Tables / dbt-test posture, as a plain parquet operator): every
    * rule is evaluated in ONE scan, rows failing any rule land in the
    * `__valid=false` partition annotated with the comma-joined names of
    * the rules they violate (declaration order — `concat_ws` skips the
    * NULLs of satisfied rules, so no array plumbing survives into the
    * file), clean rows land in `__valid=true`. Partitioning does the
    * routing — no second scan, no driver-side split — and downstream
    * readers get partition pruning on validity for free.
    *
    * Rule predicates must be deterministic; a NULL predicate result
    * counts as a violation (ternary logic must not smuggle bad rows
    * into the clean lane).
    */
  def writeWithQuarantine(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      path: String
  ): Unit = {
    require(rules.nonEmpty, "need at least one expectation rule")
    val flags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("__violations", concat_ws(",", flags: _*))
      .withColumn("__valid", col("__violations") === "")
      .write
      .mode("overwrite")
      .partitionBy("__valid")
      .parquet(path)
  }
}
