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
}
