package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.Provenance

/** Plan-walk lineage goldens: value provenance through aliases,
  * aggregates, windows and generators; predicate/join-key columns
  * excluded by design.
  */
class ProvenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lineage(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    Provenance.columnLineage(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("alias chains and arithmetic resolve to leaf columns; filters don't add sources") {
    val t = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val q = t.filter(col("c") > 0) // c is predicate-only
      .select((col("a") + col("b")).as("ab"), col("a").as("a2"))
      .select((col("ab") * 2).as("ab2"), col("a2"))
    // leaf columns are the LocalRelation's tuple fields: toDF(...) is
    // itself a rename Project the walk (correctly) sees through
    assert(lineage(q) === Set(
      ("ab2", "local", "_1"), ("ab2", "local", "_2"), ("a2", "local", "_1")))
  }

  test("aggregate and window expressions track their references; join keys excluded") {
    val l = Seq((1L, 10.0)).toDF("k", "v")
    val r = Seq((1L, "x")).toDF("k2", "tag")
    val q = l.join(r, col("k") === col("k2"))
      .groupBy(col("tag"))
      .agg(sum(col("v")).as("sv"))
    assert(lineage(q) === Set(("tag", "local", "_2"), ("sv", "local", "_2")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tag"))
    val q2 = l.join(r, col("k") === col("k2"))
      .select(col("tag"), sum(col("v")).over(w).as("running"))
    assert(lineage(q2).contains(("running", "local", "_2")))
  }

  test("generator outputs inherit the exploded column's sources") {
    val t = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
    val q = t.select(col("id"), explode(col("xs")).as("x"))
    assert(lineage(q) === Set(("id", "local", "_1"), ("x", "local", "_2")))
  }

  test("union merges per-position sources from EVERY branch") {
    val a = Seq((1L, 2L)).toDF("x", "y").select(col("x").as("v"))
    val b = Seq((3L, 4L)).toDF("p", "q").select(col("q").as("v"))
    // Union reuses branch 0's ExprIds for its output — branch b's
    // provenance must still appear
    assert(lineage(a.union(b)) === Set(
      ("v", "local", "_1"), ("v", "local", "_2")))
    val custA = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_quantity").as("v"))
    val custB = Seq(Tuple1(1.0)).toDF("z").select(col("z").as("v"))
    assert(lineage(custA.union(custB)) === Set(
      ("v", "lineitem", "l_quantity"), ("v", "local", "_1")))
  }

  test("parquet leaves report the file basename as the table") {
    val lineitem = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val q = lineitem.select((col("l_extendedprice") * col("l_quantity")).as("amount"))
    assert(lineage(q) === Set(
      ("amount", "lineitem", "l_extendedprice"), ("amount", "lineitem", "l_quantity")))
  }
}
