package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulCounter

/** transformWithState running totals: final per-user state over the
  * bounded replay equals the batch aggregate (state accumulates
  * correctly across emissions; RocksDB-backed ValueState).
  */
class StatefulCounterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("final running totals equal the batch per-user aggregate") {
    val sfDir = "/root/testdata/sf0.001"
    val got = StatefulCounter.run(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    val expected = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    assert(got.size == expected.size)
    // counts must match exactly; sums to a cent (double accumulation order)
    assert(got == expected)
  }
}
