package graft.operators

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability WITHOUT extra scans: named aggregate metrics
  * collected while the main action runs, via `Dataset.observe`.
  *
  * The scale rationale: the naive way to publish "rows written / nulls
  * seen / max event time" for a pipeline run is a second `agg()` pass —
  * at 100 TB that is a second read of the lake. Observed metrics are
  * accumulator-backed: they ride the SAME job as the action, cost one
  * row of merging per task, and arrive on the driver with the job's
  * completion event. (Same mechanism Structured Streaming exposes per
  * micro-batch through `StreamingQueryProgress.observedMetrics`.)
  *
  * Metric expressions must be accumulator-safe aggregates (count/sum/
  * min/max/avg over the observed rows — Spark rejects non-aggregates at
  * analysis time). Delivery is a listener callback, inherently
  * asynchronous; `withMetrics` bridges that with a bounded wait.
  */
object Observe {

  /** Run `action` on an observed copy of `df`; return its result plus the
    * metric row as name → value. Empty map only if the action ran no job
    * over `df` (nothing scanned → nothing observed) or delivery exceeded
    * `timeoutMs`.
    */
  def withMetrics[T](
      df: DataFrame,
      name: String,
      metrics: Seq[Column],
      timeoutMs: Long = 10000L
  )(action: DataFrame => T): (T, Map[String, Any]) = {
    require(metrics.nonEmpty, "at least one metric expression")
    val spark = df.sparkSession
    val observed = df.observe(name, metrics.head, metrics.tail: _*)
    val slot = new AtomicReference[Row](null)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get(name).foreach(slot.set)
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action(observed)
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (slot.get == null && System.nanoTime() < deadline) Thread.sleep(10)
      val row = slot.get
      val collected =
        if (row == null) Map.empty[String, Any]
        else row.schema.fieldNames.zip(row.toSeq).toMap
      (result, collected)
    } finally {
      spark.listenerManager.unregister(listener)
    }
  }
}
