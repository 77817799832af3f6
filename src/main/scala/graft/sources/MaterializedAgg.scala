package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED AGGREGATE over an append-only
  * [[LakeLog]] table — self-maintainable count/sum rollups refreshed
  * from the manifest delta, never a full rescan:
  *
  *   - `aggOf` turns any slice into per-key partial state
  *     (`n` + one `<c>_sum` per value column);
  *   - `refresh` aggregates ONLY the files appended since the last
  *     refreshed version ([[LakeLog.readDelta]] — the manifest names
  *     them) and merges the partials into the stored result by key
  *     (count/sum are associative, so partial states add);
  *   - `avg`-style metrics derive from (sum, n) at read time.
  *
  * This is the 100 TB shape of a continuously-maintained rollup: each
  * refresh costs O(new data) + O(|MV|), regardless of table size. The
  * same merge law is what Spark itself uses for partial aggregation —
  * here it is applied ACROSS refreshes instead of across tasks.
  */
object MaterializedAgg {

  /** Per-key partial aggregate of a slice: `keyCols`, `n`, `<c>_sum`. */
  def aggOf(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"${c}_sum")): _*)

  /** Merge two partial states (same schema) by key: counts and sums add.
    * Keys present in either side survive; sums are null-safe (a key with
    * only-null inputs keeps null, as a direct aggregate would).
    */
  def merge(mv: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val sumCols = mv.columns.filterNot(c => keyCols.contains(c) || c == "n")
    mv.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sumCols.toSeq.map(c => sum(col(c)).as(c)): _*)
  }

  /** Refresh the materialized aggregate from `fromV` (the last refreshed
    * version; 0 = nothing yet) to `toV`: aggregate the appended files
    * only, merge into `mv` (None = first refresh).
    */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      mv: Option[DataFrame],
      fromV: Long,
      toV: Long,
      keyCols: Seq[String],
      sumCols: Seq[String]
  ): DataFrame = {
    val delta = aggOf(LakeLog.readDelta(spark, tablePath, fromV, toV), keyCols, sumCols)
    mv.fold(delta)(m => merge(m, delta, keyCols))
  }
}
