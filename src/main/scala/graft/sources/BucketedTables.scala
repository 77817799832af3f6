package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-bucketed tables — Spark's native co-location primitive: a
  * table written `bucketBy(n, key).sortBy(key)` records the bucket spec
  * in the session catalog, and a join of two tables bucketed the same
  * way on the join key needs NO exchange on either side (each task
  * merges bucket i with bucket i). This is the 100 TB fact-to-fact
  * join answer: the shuffle is paid ONCE at write time and amortized
  * over every subsequent join — unlike [[LakeWriter.writeBucketed]]'s
  * hand-rolled directory layout (which serves key-probe pruning), the
  * catalog spec is what the PLANNER consumes.
  *
  * Tables are EXTERNAL (explicit `path`), so nothing lands in the
  * default warehouse directory; `mode(overwrite)` makes registration
  * idempotent within a session.
  */
object BucketedTables {

  /** Write `df` as an external catalog table bucketed+sorted on `key`. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      key: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  /** The registered table, scanned WITH its bucket spec. */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
