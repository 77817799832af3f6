package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place the engine touches a `private[sql]` Spark API: turning a
  * custom [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinPlan]]) back into a
  * DataFrame requires `Dataset.ofRows`, which Spark scopes to its own
  * package — the standard extension-library technique (a bridge object in
  * an `org.apache.spark.sql` subpackage) used by every catalog/lakehouse
  * plugin. Everything else in the engine uses only public API.
  */
object SqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True when no DataFrame-level cache entry is registered — the probe
    * behind the r11 hygiene regression tests (library operators must
    * release every `cache()` before returning; `localCheckpoint` persists
    * live in the RDD layer, not here, so an output-sized checkpoint does
    * not trip this).
    */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
