package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Observe

/** Observed metrics ride the main action's job: values match a direct
  * aggregation, arrive for both collect- and write-style actions, and
  * reflect the observed POSITION in the plan (post-filter rows, not
  * input rows).
  */
class ObserveSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = (1L to 1000L)
    .map(i => (i, if (i % 10 == 0) null else s"u$i", i * 1.5))
    .toDF("id", "name", "score")

  test("metrics during a write match a direct aggregation") {
    val out = Files.createTempDirectory("graft_obs").resolve("t").toString
    val (_, m) = Observe.withMetrics(
      df,
      "ingest",
      Seq(
        count(lit(1)).as("n_rows"),
        sum(when(col("name").isNull, 1).otherwise(0)).as("n_null_names"),
        max(col("score")).as("max_score"))) { d =>
      d.write.mode("overwrite").parquet(out)
    }
    assert(m("n_rows") == 1000L)
    assert(m("n_null_names") == 100L)
    assert(m("max_score") == 1500.0)
    assert(spark.read.parquet(out).count() == 1000L)
  }

  test("metrics observe the plan position: post-filter rows only") {
    val (n, m) = Observe.withMetrics(
      df.filter(col("id") <= 200),
      "gate",
      Seq(count(lit(1)).as("n_rows"), min(col("id")).as("min_id"))) { d =>
      d.count()
    }
    assert(n == 200L)
    assert(m("n_rows") == 200L && m("min_id") == 1L)
  }
}
