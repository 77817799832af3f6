package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Write `df` as a partitioned, sorted, size-bounded parquet table. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L
  ): Unit = {
    val arranged = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    arranged.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
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
}
