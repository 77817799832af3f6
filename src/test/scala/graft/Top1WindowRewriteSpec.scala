package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Top1WindowRewrite

/** The automatic `row_number() = 1` → `min_by/max_by` hash-aggregate
  * rewrite: naive latest-row-per-key window code gets the
  * partial-aggregable plan with identical results; the rule stays inert
  * without its conf and refuses every shape it can't prove equivalent.
  */
class Top1WindowRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    spark.conf.set(Top1WindowRewrite.EnabledConf, "true")
    try body
    finally spark.conf.unset(Top1WindowRewrite.EnabledConf)
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // tie-free ordering: ts = distinct per (k) by construction
  private def events(): DataFrame =
    (0 until 400)
      .map(i => (i % 7, i * 13 % 401, s"v$i"))
      .toDF("k", "ts", "payload")

  private def naiveTop1(df: DataFrame): DataFrame =
    df.withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts")))
      .filter($"rn" === 1)
      .drop("rn")

  test("rn=1 over ascending order becomes a windowless min_by aggregate") {
    val df = events()
    val base = naiveTop1(df).collect().toSet
    withRule {
      val got = naiveTop1(df)
      val plan = optimized(got)
      assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
      assert(plan.contains("min_by"), s"no min_by aggregate in:\n$plan")
      assert(got.collect().toSet === base)
    }
  }

  test("descending order routes to max_by, identical rows") {
    val df = events()
    def latest(d: DataFrame) =
      d.withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts".desc)))
        .filter($"rn" === 1)
        .drop("rn")
    val base = latest(df).collect().toSet
    withRule {
      val got = latest(df)
      val plan = optimized(got)
      assert(!plan.contains("Window") && plan.contains("max_by"), plan)
      assert(got.collect().toSet === base)
    }
  }

  test("multi-key ordering folds into one lexicographic struct comparison") {
    val df = (0 until 300)
      .map(i => (i % 5, i % 3, i, s"p$i"))
      .toDF("k", "a", "b", "payload")
    def top1(d: DataFrame) =
      d.withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"a", $"b")))
        .filter($"rn" === 1)
        .drop("rn")
    val base = top1(df).collect().toSet
    withRule {
      val got = top1(df)
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().toSet === base)
    }
  }

  test("empty PARTITION BY (global argmin) rewrites too — no single-partition sort") {
    val df = events()
    def first(d: DataFrame) =
      d.withColumn("rn", row_number().over(W.orderBy($"ts")))
        .filter($"rn" === 1)
        .drop("rn")
    val base = first(df).collect().toSet
    withRule {
      val got = first(df)
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().toSet === base)
    }
  }

  test("empty PARTITION BY on EMPTY input yields zero rows, not one null row") {
    val df = events().filter($"ts" < 0) // provably empty after the filter
    def first(d: DataFrame) =
      d.withColumn("rn", row_number().over(W.orderBy($"ts")))
        .filter($"rn" === 1)
        .drop("rn")
    withRule {
      val got = first(df)
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().isEmpty, "global argmin over empty input must emit no row")
    }
  }

  test("residual filter conjuncts survive above the rewrite") {
    val df = events()
    def top1Big(d: DataFrame) =
      d.withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts")))
        .filter($"rn" === 1 && $"ts" >= 3)
        .drop("rn")
    val base = top1Big(df).collect().toSet
    withRule {
      val got = top1Big(df)
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().toSet === base)
    }
  }

  test("rank column referenced above the filter rematerializes as literal 1") {
    val df = events()
    withRule {
      val got = df
        .withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts")))
        .filter($"rn" === 1)
        .select($"k", $"rn" * 10 as "ten")
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().forall(_.getInt(1) == 10))
    }
  }

  test("nullable ascending key rewrites with NULLS FIRST placement intact") {
    val df = Seq((1, Some(5), "a"), (1, None, "b"), (2, Some(1), "c"))
      .toDF("k", "o", "payload")
    withRule {
      val got = df
        .withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"o")))
        .filter($"rn" === 1)
      val plan = optimized(got)
      assert(!plan.contains("Window"), s"nullable key blocked the rewrite:\n$plan")
      // NULLS FIRST: the null row wins partition 1
      val rows = got.collect().map(r => r.getInt(0) -> r).toMap
      assert(rows(1).isNullAt(1) && rows(2).getInt(1) == 1)
    }
  }

  test("nullable descending key: NULLS LAST — null row loses unless alone") {
    val df = Seq((1, Some(5), "a"), (1, None, "b"), (2, Option.empty[Int], "c"))
      .toDF("k", "o", "payload")
    withRule {
      val got = df
        .withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"o".desc)))
        .filter($"rn" === 1)
      assert(!optimized(got).contains("Window"), optimized(got))
      val rows = got.collect().map(r => r.getInt(0) -> r).toMap
      assert(rows(1).getInt(1) == 5, "non-null must beat null under desc NULLS LAST")
      assert(rows(2).isNullAt(1), "all-null partition still yields its row")
    }
  }

  test("nullable key explicit NULLS LAST ascending: non-null wins") {
    val df = Seq((1, Some(7), "a"), (1, None, "b")).toDF("k", "o", "payload")
    withRule {
      val got = df
        .withColumn(
          "rn", row_number().over(W.partitionBy($"k").orderBy($"o".asc_nulls_last)))
        .filter($"rn" === 1)
      assert(!optimized(got).contains("Window"), optimized(got))
      assert(got.collect().head.getInt(1) == 7)
    }
  }

  test("rank()/dense_rank() are left alone (ties would multiply rows)") {
    val df = events()
    withRule {
      val got = df
        .withColumn("rn", rank().over(W.partitionBy($"k").orderBy($"ts")))
        .filter($"rn" === 1)
      assert(optimized(got).contains("Window"), optimized(got))
    }
  }

  test("inert without the conf") {
    val df = events()
    val got = naiveTop1(df)
    assert(optimized(got).contains("Window"), optimized(got))
  }

  test("rn <= 1 and rn < 2 pin forms rewrite as well") {
    val df = events()
    withRule {
      val a = df
        .withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts")))
        .filter($"rn" <= 1)
      val b = df
        .withColumn("rn", row_number().over(W.partitionBy($"k").orderBy($"ts")))
        .filter($"rn" < 2)
      assert(!optimized(a).contains("Window"), optimized(a))
      assert(!optimized(b).contains("Window"), optimized(b))
      assert(a.drop("rn").collect().toSet === b.drop("rn").collect().toSet)
    }
  }
}
