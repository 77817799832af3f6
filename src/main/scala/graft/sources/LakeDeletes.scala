package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ deletes for the [[LakeLog]] lake: a delete writes a
  * DELETION VECTOR — the (file, row_index) positions of the victims —
  * instead of rewriting data files (the Delta/Iceberg v2 "position
  * delete" design). Why it matters at 100 TB: a predicate that kills
  * 0.1% of rows scattered over every file would force a full-corpus
  * rewrite under copy-on-write; as a DV it is a KB-scale sidecar write,
  * and the rewrite cost moves to an explicit, batchable [[compact]].
  *
  * Positions come from the scan itself (`_metadata.file_path` /
  * `_metadata.row_index` — parquet row indexes, no synthetic ids, no
  * shuffle), so a DV row pins exactly one physical row forever:
  * data files are immutable, re-deleting an already-deleted position is
  * harmlessly idempotent, and two DVs union.
  *
  * The DV relation is ITSELF a [[LakeLog]] table (`<path>_dv`): delete
  * commits are atomic/versioned/time-travelable with the machinery the
  * lake already has, and DV appends CAS against concurrent deletes.
  * Read = base snapshot ANTI-JOIN live DV on (file, pos) — Catalyst/AQE
  * broadcasts the (small) DV side, so the read stays a single scan with
  * a map-side filter, no corpus shuffle.
  */
object LakeDeletes {

  /** The sidecar lake table holding the accumulated deletion vector. */
  def dvPath(path: String): String = path + "_dv"

  private def withPos(df: DataFrame): DataFrame = df
    .withColumn("__file", element_at(split(col("_metadata.file_path"), "/"), -1))
    .withColumn("__pos", col("_metadata.row_index"))

  /** Append the positions matching `pred` (evaluated on the current
    * base snapshot; re-deleting an already-dead position is idempotent
    * under the anti-join) to the deletion vector. Returns the new DV
    * version. One scan of the base table; the DV write is victim-sized.
    */
  def deleteWhere(spark: SparkSession, path: String, pred: Column): Long = {
    val victims = withPos(LakeLog.read(spark, path))
      .filter(pred)
      .select(col("__file").as("file"), col("__pos").as("pos"))
    LakeLog.append(victims, dvPath(path))
  }

  /** Read the live rows: base snapshot minus deletion-vector positions.
    * `version`/`dvVersion` time-travel the two logs independently (-1 =
    * latest); reading an old dvVersion resurrects later deletes — the
    * snapshot-isolation story deletes inherit from the log.
    */
  def readLive(
      spark: SparkSession,
      path: String,
      version: Long = -1L,
      dvVersion: Long = -1L
  ): DataFrame = {
    val base = withPos(LakeLog.read(spark, path, version))
    val dv =
      if (LakeLog.versions(dvPath(path)).isEmpty) null
      else LakeLog.read(spark, dvPath(path), dvVersion)
    val live =
      if (dv == null) base
      else
        base.join(
          dv.select(col("file").as("__file"), col("pos").as("__pos")),
          Seq("__file", "__pos"),
          "left_anti")
    live.drop("__file", "__pos")
  }

  /** Copy-on-write compaction: materialize the live rows as a fresh
    * base snapshot and reset the DV — the explicit, batchable rewrite
    * merge-on-read deferred. Returns the new base version.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val live = readLive(spark, path).localCheckpoint()
    val v = LakeLog.overwrite(live, path)
    LakeLog.overwrite(live.limit(0).select(
      lit("").as("file"), lit(0L).as("pos")), dvPath(path))
    v
  }
}
