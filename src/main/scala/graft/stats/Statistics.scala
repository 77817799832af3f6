package graft.stats

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.SimCompleted

/** Relational statistics layer over the simulation output — the Spark
  * re-expression of reference src/statistics.py:9-154 (A1–A6 in SURVEY §2).
  *
  * Everything here is a single partial+final hash aggregate over the
  * completed set; at 100 TB of completed records this is the layer that
  * scales (the sequential sim core does not need to — SURVEY §4.2).
  * NaN (not null) marks empty-aggregate results for `np.nan` parity
  * (src/statistics.py:64,118-121).
  */
object Statistics {

  /** snake_case DataFrame view of the completed set (engine-facing schema,
    * SURVEY §1.4).
    */
  def toDF(completed: Dataset[SimCompleted]): DataFrame =
    completed.toDF(
      "user_id", "request_time_micros", "processing_time", "sim_arrival_time",
      "arrival_time_in_queue", "start_time", "finish_time", "used_api_id",
      "queue", "status", "seq"
    )

  /** camelCase → snake_case rename for DataFrames derived from
    * [[SimCompleted]] structs (e.g. the scenario fan-out's nested column).
    */
  val SnakeRenames: Seq[(String, String)] = Seq(
    "userId" -> "user_id", "requestTimeMicros" -> "request_time_micros",
    "processingTime" -> "processing_time", "simArrivalTime" -> "sim_arrival_time",
    "arrivalTimeInQueue" -> "arrival_time_in_queue", "startTime" -> "start_time",
    "finishTime" -> "finish_time", "usedApiId" -> "used_api_id"
  )

  def renameToSnake(df: DataFrame): DataFrame =
    SnakeRenames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  private val processedPred = col("finish_time") =!= lit(-1.0)

  /** Valid queuing time per P2 (src/statistics.py:9-43): processed rows with
    * non-negative start/arrival and start >= arrival; null otherwise.
    */
  private val queuingTime =
    when(
      processedPred &&
        col("start_time") >= 0 && col("arrival_time_in_queue") >= 0 &&
        col("start_time") >= col("arrival_time_in_queue"),
      col("start_time") - col("arrival_time_in_queue")
    )

  /** One-row summary (src/statistics.py:102-121,144-152): counts, mean and
    * exact linear-interpolation percentiles of queuing time, per-queue
    * enqueue totals. A single agg ⇒ one shuffle of partial buffers.
    */
  private def summaryAggs: Seq[org.apache.spark.sql.Column] = {
    val nan = lit(Double.NaN)
    Seq(
      sum(when(col("is_processed"), 1L).otherwise(0L)).cast("long")
        .as("total_requests_processed"),
      sum(when(!col("is_processed"), 1L).otherwise(0L)).cast("long")
        .as("total_requests_rejected"),
      coalesce(avg(col("qt")), nan).as("average_queuing_time"),
      coalesce(expr("percentile(qt, 0.50)"), nan).as("p50"),
      coalesce(expr("percentile(qt, 0.75)"), nan).as("p75"),
      coalesce(expr("percentile(qt, 0.90)"), nan).as("p90"),
      coalesce(expr("percentile(qt, 0.99)"), nan).as("p99"),
      sum(when(col("queue") === "priority", 1L).otherwise(0L)).cast("long")
        .as("priority_queue_enqueued_total"),
      sum(when(col("queue") === "normal", 1L).otherwise(0L)).cast("long")
        .as("normal_queue_enqueued_total")
    )
  }

  def summary(completedDF: DataFrame): DataFrame =
    completedDF
      .select(
        processedPred.as("is_processed"),
        queuingTime.as("qt"),
        col("queue")
      )
      .agg(summaryAggs.head, summaryAggs.tail: _*)

  /** Per-group summary (e.g. per scenario of a fan-out run) — the same
    * one-pass aggregate with a grouping key; scales to any number of
    * concurrent scenarios with a single shuffle.
    */
  def summaryByGroup(completedDF: DataFrame, groupCols: Seq[String]): DataFrame =
    completedDF
      .select(
        groupCols.map(col) ++ Seq(
          processedPred.as("is_processed"),
          queuingTime.as("qt"),
          col("queue")
        ): _*
      )
      .groupBy(groupCols.map(col): _*)
      .agg(summaryAggs.head, summaryAggs.tail: _*)

  /** Per-endpoint usage with dense-domain zero-fill (A4,
    * src/statistics.py:126-141): only processed rows with an in-domain id
    * count; the `api_1..api_N` key dimension is generated and broadcast so
    * absent endpoints appear with count 0.
    */
  def apiUsage(completedDF: DataFrame, numApis: Int): DataFrame = {
    val spark = completedDF.sparkSession
    val domain = spark
      .range(1, numApis + 1L)
      .select(col("id").cast("int").as("api_id_num"))
    val counts = completedDF
      .filter(
        processedPred && col("used_api_id").isNotNull &&
          col("used_api_id").between(1, numApis)
      )
      .groupBy(col("used_api_id").as("api_id_num"))
      .agg(count(lit(1)).as("cnt"))
    // Hint-free: both sides are ≤ numApis rows; AQE picks the build side
    // (the preserved side of a left join cannot be the broadcast build
    // side, so only the counts side is eligible anyway).
    domain
      .join(counts, Seq("api_id_num"), "left")
      .select(
        concat(lit("api_"), col("api_id_num")).as("api_id"),
        coalesce(col("cnt"), lit(0L)).as("n_used")
      )
  }

  /** A5 enqueue totals in long format (reference counter semantics:
    * src/queue_manager.py:121-123,267-276 — rejected rows were never
    * enqueued and are excluded).
    */
  def queueCounts(completedDF: DataFrame): DataFrame =
    completedDF
      .filter(col("queue").isNotNull)
      .groupBy(col("queue"))
      .agg(count(lit(1)).as("n_enqueued"))
}
