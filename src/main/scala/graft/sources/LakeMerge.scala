package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO for a plain parquet lake table: keyed upsert + delete with a
  * partition-pruned rewrite — the workhorse of incremental lake
  * maintenance (CDC apply, dimension refresh, GDPR delete).
  *
  * Semantics (per key in `updates`):
  *   - key exists in the table → row is replaced (WHEN MATCHED UPDATE),
  *     or removed when the delete flag is set (WHEN MATCHED DELETE);
  *   - key absent → row is inserted (WHEN NOT MATCHED INSERT).
  * Keys must be unique within `updates` (one winner per key is not
  * defined otherwise — same precondition as SQL MERGE's "cannot update
  * the same row twice").
  *
  * Scale design: only partitions that CONTAIN a touched key (current
  * version's partition, found with one semi-join) or RECEIVE one (the
  * update row's partition) are rewritten, through Spark's dynamic
  * partition overwrite — the rest of the table's files are never read for
  * rewrite nor touched. An update may move a row across partitions (e.g.
  * a status change on a status-partitioned table): the old partition is
  * rewritten without the row, the new one with it. Partitions left EMPTY
  * by the merge are removed explicitly (dynamic overwrite only replaces
  * partitions it writes). The merged slice is made DURABLE in a staging
  * directory before the overwrite begins — the overwrite replaces the
  * very files the slice was computed from, so its source must not be a
  * recomputable lineage over them.
  *
  * A plain-parquet table has no transaction log, so the swap is not
  * atomic the way a table format's metadata commit is: a reader
  * concurrent with the rewrite can see a partition mid-replace. That is
  * inherent to bare parquet (the reason table formats exist); batch
  * pipelines that own their tables between runs — the shape this engine
  * targets — are unaffected.
  *
  * Preconditions: partition values non-null; `updates` carries the
  * table's full schema (plus the optional delete-flag column) — unless
  * `evolveSchema` is set.
  *
  * Schema evolution (`evolveSchema = true`) supports column ADDITION with
  * SQL-MERGE semantics:
  *   - source columns absent from the table are added; existing rows read
  *     null for them;
  *   - table columns absent from the source keep their existing values on
  *     matched (updated) rows and are null on inserted rows;
  *   - overlapping columns keep the TABLE's type (source values are cast)
  *     so file schemas stay merge-compatible; type evolution is not
  *     supported.
  * On a partitioned table only touched partitions are rewritten, so after
  * an evolving merge file schemas differ across partitions — readers must
  * use parquet's `mergeSchema` option (files without the column read null)
  * until a [[compact]] normalizes every file to the union schema.
  */
object LakeMerge {

  def mergeInto(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      deleteCol: Option[String] = None,
      evolveSchema: Boolean = false
  ): Unit = {
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    val existing0 = {
      val r = spark.read
      (if (evolveSchema) r.option("mergeSchema", "true") else r).parquet(path)
    }
    val tableCols = existing0.columns.toSeq
    val srcCols = updates.columns.toSeq.filterNot(deleteCol.contains)
    val newCols = if (evolveSchema) srcCols.filterNot(tableCols.contains) else Nil
    val missingCols = if (evolveSchema) tableCols.filterNot(srcCols.contains) else Nil
    if (evolveSchema) {
      require(keyCols.forall(srcCols.contains),
        s"evolveSchema merge: key columns ${keyCols.filterNot(srcCols.contains)} missing from updates")
      require(partitionCols.forall(srcCols.contains),
        s"evolveSchema merge: partition columns ${partitionCols.filterNot(srcCols.contains)} missing from updates")
    }
    // Union schema, table columns first — the post-merge file layout.
    val dataCols = tableCols ++ newCols
    // Existing rows under the union schema: added columns read null.
    val existing = newCols.foldLeft(existing0)((df, c) =>
      df.withColumn(c, lit(null).cast(updates.schema(c).dataType)))

    val upsertRows = deleteCol.fold(updates)(d => updates.filter(!col(d)))
    val upserts =
      if (!evolveSchema) upsertRows.select(dataCols.map(col): _*)
      else {
        // Overlapping columns cast to the table's type: parquet mergeSchema
        // does not widen, so a type drift here would poison the table.
        val srcTyped = upsertRows.select(srcCols.map { c =>
          if (tableCols.contains(c)) col(c).cast(existing0.schema(c).dataType).as(c)
          else col(c)
        }: _*)
        if (missingCols.isEmpty) srcTyped.select(dataCols.map(col): _*)
        else
          // SQL MERGE: target-only columns keep their current values on
          // matched rows (one keyed lookup), null on inserts.
          srcTyped
            .join(existing0.select((keyCols ++ missingCols).map(col): _*), keyCols, "left")
            .select(dataCols.map(col): _*)
      }
    // Every key in `updates` — upsert or delete — evicts the current row.
    val touchedKeys = updates.select(keyCols.map(col): _*).distinct()

    if (partitionCols.isEmpty) {
      val merged = upserts.unionByName(
        existing.join(touchedKeys, keyCols, "left_anti"))
      swapRewrite(spark, path, merged, Nil)
    } else {
      // Partitions holding the CURRENT version of a touched key...
      val oldParts = existing
        .join(touchedKeys, keyCols, "left_semi")
        .select(partitionCols.map(col): _*)
        .distinct()
      // ...plus partitions the new versions land in.
      val newParts = upserts.select(partitionCols.map(col): _*).distinct()
      val touchedParts = oldParts.union(newParts).distinct().collect().toSeq
      if (touchedParts.isEmpty) return

      val slice = existing.filter(partitionFilter(partitionCols, touchedParts))
      val mergedSlice = upserts
        .unionByName(slice.join(touchedKeys, keyCols, "left_anti"))
      // The merged slice must be DURABLE before the overwrite starts: it
      // reads the very files the overwrite replaces, and sourcing the
      // write from a persist()ed plan leaves a recompute-after-cache-loss
      // path that would re-read mid-overwrite files on a real cluster.
      // One flat staging write of the touched slice (partition values
      // stay as data columns) severs that lineage completely.
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new Path(path + s"__merge_staging_${System.nanoTime()}")
      mergedSlice.write.parquet(staging.toString)
      try {
        // an all-deletes merge can leave the slice empty; parquet writes
        // no readable footer for an empty frame, so short-circuit
        val hasData = fs.listStatus(staging)
          .exists(_.getPath.getName.endsWith(".parquet"))
        val writtenParts: Set[Seq[Any]] =
          if (!hasData) Set.empty
          else {
            val staged = spark.read.parquet(staging.toString)
            withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
              staged.write
                .mode("overwrite")
                .partitionBy(partitionCols: _*)
                .parquet(path)
            }
            staged
              .select(partitionCols.map(col): _*)
              .distinct()
              .collect()
              .map(_.toSeq)
              .toSet
          }
        // A partition whose every row was deleted or moved away is written
        // zero rows — dynamic overwrite leaves its old files in place, so
        // drop the directory itself.
        touchedParts
          .filterNot(r => writtenParts.contains(r.toSeq))
          .foreach { r =>
            val dir = partitionCols.zipWithIndex
              .map { case (c, i) => s"$c=${r.get(i)}" }
              .mkString("/")
            fs.delete(new Path(path, dir), true)
          }
      } finally {
        fs.delete(staging, true)
      }
    }
  }

  /** CDC APPLY: drain a stream of change rows into the lake table, one
    * MERGE per micro-batch (`foreachBatch` — the standard lake-upsert
    * sink shape). Batches apply in order, so a later batch's version of a
    * key wins; within a batch, `sequenceCol` (a CDC log offset /
    * change timestamp) picks the latest version per key — without it the
    * caller must guarantee per-batch key uniqueness (MERGE's usual
    * precondition).
    *
    * Delivery is at-least-once (foreachBatch's contract): safe here
    * because replaying a batch re-merges the SAME key versions — upserts
    * overwrite with identical rows, deletes of absent keys are no-ops —
    * so the table converges. The file-source checkpoint in
    * `checkpoint` confines replays to the interrupted batch.
    */
  def streamMergeToLake(
      updates: DataFrame,
      path: String,
      keyCols: Seq[String],
      checkpoint: String,
      partitionCols: Seq[String] = Nil,
      deleteCol: Option[String] = None,
      sequenceCol: Option[String] = None,
      evolveSchema: Boolean = false
  ): Unit = {
    val q = updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val versioned = sequenceCol.fold(batch.toDF()) { sc =>
          // latest change per key within the batch (CDC compaction)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)
            .orderBy(col(sc).desc)
          batch.toDF()
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .drop("__rn", sc)
        }
        if (!versioned.isEmpty) {
          mergeInto(batch.sparkSession, path, versioned, keyCols, partitionCols, deleteCol,
            evolveSchema)
        }
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Rewrite a table in place with small-file compaction: each partition's
    * rows are collapsed into the fewest files (capped by
    * `maxRecordsPerFile`), the defrag counterpart of a streaming or
    * micro-batch ingest that accretes one file per trigger. Content is
    * unchanged. Reads with `mergeSchema`, so it doubles as the
    * schema-normalize pass after an evolving [[mergeInto]]: every file
    * comes out carrying the union schema.
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L,
      numFiles: Int = 1
  ): Unit = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val arranged =
      if (partitionCols.isEmpty) df.repartition(numFiles)
      // hash-cluster rows by partition key so each partition directory is
      // produced by as few tasks as possible (1 file/partition/task)
      else df.repartition(partitionCols.map(col): _*)
    swapRewrite(spark, path, arranged, partitionCols, maxRecordsPerFile)
  }

  /** Full rewrite via a staging directory: materialize BEFORE deleting the
    * source (a direct overwrite of a path being lazily read is a
    * read-your-own-tombstones failure), then swap directories.
    */
  private def swapRewrite(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    val target = new Path(path)
    val staging = new Path(path + s"__staging_${System.nanoTime()}")
    val writer = df.write.mode("overwrite").option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"rename $staging -> $target failed")
  }

  /** OR-of-ANDs membership filter over the (small) touched-partition set. */
  private def partitionFilter(
      partitionCols: Seq[String],
      parts: Seq[org.apache.spark.sql.Row]
  ): Column =
    parts
      .map(r =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _))
      .reduce(_ || _)

  private def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
