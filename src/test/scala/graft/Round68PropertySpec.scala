package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, SpaceSavingTopK}
import graft.sources.Tables

/** Round-68 sweeps for the native SpaceSaving aggregate: the exact
  * (capacity ≥ NDV) regime against a driver count fold, the SUB-capacity
  * regime's Metwally guarantees (est ≥ true ≥ est − err, heavy hitters
  * always reported, bounded size) under a forced multi-partition
  * merge, the classic Σest = N single-partition identity, and a direct
  * serde round-trip on the object buffer.
  */
class Round68PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q618/q619 exact regime equals driver counts (err 0)") {
    val events = Tables.events(spark, sfDir)
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q618_space_saving")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == exact)
    assert(got.forall(_._3 == 0L), "capacity >= NDV must report zero error")
    // emission order: count desc, key asc
    assert(got.sortBy(g => (-g._2, g._1)).sameElements(got))
  }

  test("sub-capacity regime keeps the Metwally guarantees under merges") {
    GraftFunctions.registerAll(spark)
    val events = Tables.events(spark, sfDir)
    val keyed = events.select(concat(lit("u"), col("user_id")).as(
      "k")).repartition(7) // force partial buffers + merges
    val trueCounts = keyed.groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = trueCounts.values.sum
    val cap = 8
    assume(trueCounts.size > cap, "need NDV > capacity for this regime")
    keyed.createOrReplaceTempView("r68_sub")
    val rep = spark.sql(
      s"SELECT explode(space_saving_topk(k, $cap)) AS hh FROM r68_sub")
      .select(col("hh.key"), col("hh.est"), col("hh.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.length <= cap, "summary must stay within capacity")
    rep.foreach { case (k, est, err) =>
      val t = trueCounts.getOrElse(k, 0L)
      assert(est >= t, s"$k: est $est < true $t")
      assert(est - err <= t, s"$k: est-err ${est - err} > true $t")
    }
    val reported = rep.map(_._1).toSet
    trueCounts.filter(_._2 > n / cap).keys.foreach(h =>
      assert(reported.contains(h), s"heavy hitter $h (> N/capacity) missing"))
  }

  test("single-partition classic identity: sum of estimates = N") {
    GraftFunctions.registerAll(spark)
    Tables.events(spark, sfDir)
      .select(concat(lit("u"), col("user_id")).as("k")).coalesce(1)
      .createOrReplaceTempView("r68_single")
    val n = spark.table("r68_single").count()
    val sumEst = spark.sql(
      "SELECT explode(space_saving_topk(k, 8)) AS hh FROM r68_single")
      .agg(sum(col("hh.est"))).collect().head.getLong(0)
    assert(sumEst == n, s"sequential SpaceSaving must conserve mass: $sumEst != $n")
  }

  test("object buffer serde round-trips") {
    val agg = SpaceSavingTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("x")),
      4)
    val buf = agg.createAggregationBuffer()
    buf.update("alpha", (7L, 2L)); buf.update("beta", (3L, 0L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
