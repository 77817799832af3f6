package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog compaction — materialize the CURRENT snapshot from an
  * insert/update/delete change log (the Kafka-compacted-topic /
  * Hudi/Paimon merge-on-read read path): per key, the highest-sequence
  * change wins; a delete tombstone at the head erases the key. The
  * upstream-facing sibling of [[graft.sources.LakeMerge.mergeInto]]
  * (which APPLIES such a batch to a stored table) — this one folds the
  * log itself, e.g. before bootstrap-loading a lake table from a raw
  * CDC dump.
  *
  * Shape: one key-partitioned `row_number` — rank-1 selection plans as
  * WindowGroupLimit, so each partition forwards only its per-key head
  * rows to the shuffle, and the log (which at 100 TB dwarfs the key
  * space) never materializes per-key groups.
  */
object Changelog {

  /** Fold a change log to its live snapshot. `opCol` values: 'D' marks a
    * delete tombstone; anything else carries the row payload. Ordering
    * within a key follows `seqCol` (ties broken by nothing — sequences
    * must be unique per key, the standard CDC contract).
    */
  def compactLog(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn")
  }
}
