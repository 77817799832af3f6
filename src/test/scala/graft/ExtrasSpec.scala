package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WelfordVariance

/** Specs for the capability extras: typed UDAF, sketch accuracy, salted
  * aggregation equivalence, bucketed co-located joins.
  */
class ExtrasSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("WelfordVariance Aggregator matches the built-in var_pop") {
    import spark.implicits._
    val xs = (1 to 500).map(i => math.sin(i) * 100 + i % 7)
    val ds = xs.toDS()
    val ours = ds.select(WelfordVariance.toColumn.name("v")).collect()(0)
    val builtin = ds.agg(var_pop(col("value"))).collect()(0).getDouble(0)
    assert(math.abs(ours - builtin) / builtin < 1e-12)
  }

  test("WelfordVariance on empty input yields NaN (np.nan parity convention)") {
    import spark.implicits._
    val ours = Seq.empty[Double].toDS().select(WelfordVariance.toColumn.name("v")).collect()(0)
    assert(ours.isNaN)
  }

  test("HLL sketch lands within its configured error of the exact count") {
    val row = SparkEntry.queries("q42_sketch")(spark, sfDir).collect()(0)
    val exact = row.getAs[Long]("exact_parts").toDouble
    val approx = row.getAs[Long]("approx_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
  }

  test("approx_top_k heavy hitters are EXACT on a small domain (sketch capacity > cardinality)") {
    val row = SparkEntry.queries("q42_sketch")(spark, sfDir).collect()(0)
    // the query serializes the sketch output with to_json (scalar-output
    // contract for the driver's capture layer) — parse it back here
    val got = """\{"item":"([^"]+)","count":(\d+)\}""".r
      .findAllMatchIn(row.getAs[String]("top_flags_json"))
      .map(m => m.group(1) -> m.group(2).toLong)
      .toSeq
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (k, n) => (-n, k) }.take(3)
    assert(got.toSeq == exact.toSeq, s"got $got expected ${exact.toSeq}")
  }

  test("HLL sketches MERGE losslessly: union of per-shard sketches ≡ whole-corpus sketch") {
    // The property that makes sketches work at lake scale: build one
    // sketch per partition/shard/day, union the binaries, and the
    // estimate is identical to sketching the whole table at once.
    val li = graft.sources.Tables.lineitem(spark, sfDir).select(col("l_partkey"), col("l_orderkey"))
    val whole = li
      .select(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("e"))
      .head().getLong(0)
    val merged = li
      .withColumn("shard", col("l_orderkey") % 7)
      .groupBy(col("shard"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .select(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .head().getLong(0)
    assert(merged == whole, s"sharded-merge estimate $merged != whole-table estimate $whole")
  }

  test("JSONL and ORC round-trip the documents table losslessly") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(100)
    val expected = docs.collect().map(_.mkString("|")).sorted.toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    docs.write.mode("overwrite").json(s"$base/j")
    docs.write.mode("overwrite").orc(s"$base/o")
    val viaJson = spark.read.schema(docs.schema).json(s"$base/j")
    val viaOrc = spark.read.orc(s"$base/o")
    assert(viaJson.collect().map(_.mkString("|")).sorted.toSeq == expected)
    assert(viaOrc.collect().map(_.mkString("|")).sorted.toSeq == expected)
    assert(viaOrc.schema == docs.schema)
  }

  test("salted aggregation ≡ plain groupBy") {
    val salted = SparkEntry.queries("q43_salted_agg")(spark, sfDir).collect()
    val plain = graft.sources.Tables
      .events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_rows"), round(sum("value"), 2).as("sum_value"))
      .collect()
    assert(salted.map(_.mkString("|")).toSet == plain.map(_.mkString("|")).toSet)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    graft.sources.Tables
      .orders(spark, sfDir)
      .write
      .bucketBy(8, "o_custkey")
      .sortBy("o_custkey")
      .mode("overwrite")
      .saveAsTable("orders_b")
    graft.sources.Tables
      .customer(spark, sfDir)
      .withColumn("c_custkey", col("c_custkey").cast("long"))
      .write
      .bucketBy(8, "c_custkey")
      .sortBy("c_custkey")
      .mode("overwrite")
      .saveAsTable("customer_b")
    // Disable broadcast so the join would otherwise need a shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark
        .table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString()
      // The join keys must NOT be re-shuffled (the post-join groupBy on an
      // unrelated column legitimately exchanges once).
      assert(
        !plan.contains("Exchange hashpartitioning(o_custkey") &&
          !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles its keys:\n$plan"
      )
      assert(plan.contains("Bucketed: true"), "scan not bucketed")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
