package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale properties the engine is designed
  * around must be visible in the executed plan, not just intended —
  * filters/projections reach the parquet scan, dimension joins broadcast,
  * top-k avoids a global sort, aggregates run partial+final.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString()
  }

  test("q2 filter/projection push down to the parquet scan") {
    val plan = planOf(SparkEntry.queries("q2_filter_project")(spark, sfDir))
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("l_discount"), "discount predicate not pushed")
    // Column pruning: only 5 of 11 lineitem columns should be read.
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_partkey"), "unpruned column l_partkey in scan")
  }

  test("q6 dimension joins are broadcast, not shuffled") {
    val plan = planOf(SparkEntry.queries("q6_join_chain")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "dimension join not broadcast")
    assert(!plan.contains("SortMergeJoin"), "unexpected sort-merge join in dim chain")
  }

  test("q5 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(SparkEntry.queries("q5_topk")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("q1 aggregate runs partial+final hash aggregation") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sfDir))
    assert(plan.contains("HashAggregate"), "no hash aggregate")
    assert(plan.toLowerCase.contains("partial_"), "no partial (map-side) aggregation")
  }

  test("q7 anti join stays a broadcast join at this scale") {
    val plan = planOf(SparkEntry.queries("q7_anti_join")(spark, sfDir))
    assert(plan.contains("LeftAnti"), "anti join not planned as anti join")
  }

  test("whole-stage codegen spans the scan-filter-project pipeline of q2") {
    // Codegen stages render as "*(n) Op" prefixes in the executed plan.
    val plan = planOf(SparkEntry.queries("q2_filter_project")(spark, sfDir))
    assert(plan.contains("*("), "no codegen stage")
  }

  test("rolling_hash64 participates in codegen (no UDF boxing)") {
    graft.functions.RollingHash64.register(spark)
    val df = graft.sources.Tables
      .documents(spark, sfDir)
      .selectExpr("rolling_hash64(text) AS fp")
    val plan = planOf(df)
    assert(plan.contains("*("), "expression fell out of codegen")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), "UDF in plan")
  }
}
