package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic request datagen (S2, reference:
  * scripts/generate_sample_data.py:10-39): numUsers × maxRequestsPerUser
  * rows, random user per row, cumulative U(0.1, 1.0) inter-arrival seconds
  * from 2023-01-01Z, processing time round(U(1.0, 10.0), 1), sorted by
  * request time.
  *
  * Spark-native: md5-dyadic uniform draws (the engine's cross-replayable
  * seeded-stream contract, same construction as
  * [[graft.operators.Sampling.weightedSample]]: u = (first 12 md5 hex
  * digits of `id:seed:tag` + 0.5) / 2^48) + one window cumulative sum.
  * The reference's Python-RNG byte stream is not reproduced (engine
  * defines its own seeded stream, SURVEY §7.3b); same seed → same data
  * across runs AND across engines — any SQL engine with md5 replays the
  * generator bit-for-bit (the q38 oracle does, in DuckDB).
  *
  * Scale note: the single unpartitioned cumulative-sum window is the
  * faithful port of the reference's global arrival clock. For lake-scale
  * generation, partition the stream (e.g. per tenant) so each partition
  * carries its own clock — the same window with a partitionBy.
  */
object DataGen {

  /** Dyadic uniform in (0,1) from the row id: row-local, codegen'd,
    * engine-independent (md5 of the id's canonical decimal string).
    */
  private def dyadicU(seed: Long, tag: String) =
    (conv(substring(md5(concat(col("id").cast("string"), lit(s":$seed:$tag"))), 1, 12), 16, 10)
      .cast("double") + 0.5) / 281474976710656.0 // 2^48

  def generate(
      spark: SparkSession,
      numUsers: Int = 5,
      maxRequestsPerUser: Int = 5,
      seed: Long = 42L
  ): DataFrame = {
    val n = numUsers.toLong * maxRequestsPerUser
    val userIds = array((0 until numUsers).map(i => lit(s"user_${('a' + i).toChar}")): _*)
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark
      .range(n)
      .select(
        col("id"),
        element_at(userIds, floor(dyadicU(seed, "u") * numUsers).cast("int") + 1).as("user_id"),
        (lit(0.1) + dyadicU(seed, "g") * 0.9).as("gap"),
        round(lit(1.0) + dyadicU(seed, "p") * 9.0, 1).as("processing_time")
      )
      .withColumn("arrival_offset", sum(col("gap")).over(w))
      .select(
        col("user_id"),
        date_format(
          timestamp_micros(
            (lit(RequestCsv.SimStartMicros) + (col("arrival_offset") * 1e6).cast("long"))
          ),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        ).as("request_time"),
        col("processing_time")
      )
      .orderBy("request_time")
  }

  /** CSV sink matching the reference's output shape (header, sorted). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
