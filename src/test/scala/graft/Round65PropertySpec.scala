package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.v2.{GenScan, GenSource}

/** Round-65 connector sweeps: q612/q613 against a driver-side md5-dyadic
  * replay (exact equality), PLUS the planner facts the round is actually
  * about, asserted on the physical plans — partition pruning (4 of 16 id
  * splits planned under the q612 range), pushed id bounds on the scan,
  * column pruning down to a single field, and the residual category
  * filter staying a Spark-side FilterExec above the BatchScan in q613.
  */
class Round65PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val Seed = 42L

  private def gen = spark.read
    .format("graft-gen")
    .option("rows", 262144L)
    .option("partitions", 16)
    .option("seed", Seed)
    .load()

  private def genScanOf(df: org.apache.spark.sql.DataFrame): GenScan = {
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1, s"expected one BatchScan, got ${scans.size}")
    scans.head.asInstanceOf[GenScan]
  }

  // ---------------------------------------------------------------- q612

  test("q612 equals the driver md5-dyadic replay, exactly") {
    val expected = (65536L to 131071L)
      .map(id => (GenSource.category(id, Seed), GenSource.value(id, Seed), GenSource.score(id, Seed)))
      .groupBy(_._1)
      .map { case (cat, xs) =>
        cat -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).min, xs.map(_._3).max))
      }
    val got = SparkEntry.queries("q612_dsv2_pushdown")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("q612 plan: id range pushed, 4 of 16 splits planned, id column pruned") {
    val df = SparkEntry.queries("q612_dsv2_pushdown")(spark, sfDir)
    val scan = genScanOf(df)
    assert(scan.minId == 65536L && scan.maxId == 131071L,
      s"pushed bounds [${scan.minId}, ${scan.maxId}]")
    assert(scan.planInputPartitions().length == 4,
      "partition pruning should plan exactly the 4 covering id splits")
    // the absorbed id predicate leaves no post-scan filter, so the scan
    // reads only the three projected columns
    assert(scan.readSchema().fieldNames.toSet == Set("category", "value", "score"),
      s"read schema ${scan.readSchema().fieldNames.mkString(",")}")
    assert(!df.queryExecution.sparkPlan.exists(_.isInstanceOf[FilterExec]),
      "fully-pushed predicate must not leave a Spark-side Filter")
  }

  // ---------------------------------------------------------------- q613

  test("q613 equals the driver replay; category filter stays residual") {
    val expected = (0L until 32768L)
      .map(id => (GenSource.category(id, Seed), GenSource.value(id, Seed), id))
      .filter(_._1 == "cat_3")
    val row = SparkEntry.queries("q613_dsv2_residual")(spark, sfDir).collect().head
    assert(row.getLong(0) == expected.size.toLong)
    assert(row.getLong(1) == expected.map(_._2).sum)
    assert(row.getLong(2) == expected.map(_._3).max)

    val df = gen.filter(col("id") < 32768L && col("category") === "cat_3")
    val scan = genScanOf(df)
    assert(scan.minId == 0L && scan.maxId == 32767L, "id bound should be pushed")
    assert(scan.planInputPartitions().length == 2, "ids [0, 32767] cover 2 splits")
    assert(df.queryExecution.sparkPlan.exists(_.isInstanceOf[FilterExec]),
      "refused category predicate must remain a Spark-side Filter")
  }

  // ---------------------------------------------------------------- q615

  // AQE hides the final plan behind AdaptiveSparkPlanExec (childless);
  // materialize, then walk through the adaptive wrapper + query stages
  private def flatFinalPlan(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("q615 columnar path: ColumnarToRow in plan, equal to the row path") {
    val df = SparkEntry.queries("q615_dsv2_columnar")(spark, sfDir)
    assert(
      flatFinalPlan(df).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.ColumnarToRowExec]),
      "columnar=true must place a ColumnarToRow transition")
    val rowPath = spark.read
      .format("graft-gen")
      .option("rows", 262144L).option("partitions", 16).option("seed", Seed)
      .load()
      .filter(col("id") >= 131072L && col("id") <= 196607L)
      .select(floor(col("score") * 10).cast("int").as("decile"), col("value"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    assert(!flatFinalPlan(rowPath).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.ColumnarToRowExec]),
      "row path must not be columnar")
    val a = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = rowPath.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "columnar and row reads must agree bit-for-bit")
    assert(a.map(_._2).sum == 65536L, "decile counts must cover the id range")
  }

  // ---------------------------------------------------------------- q620

  test("q620 aggregate pushdown: closed-form partials, no data rows") {
    val df = SparkEntry.queries("q620_dsv2_agg_pushdown")(spark, sfDir)
    val row = df.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((195905L, 4096L, 200000L)))
    val scan = genScanOf(df)
    assert(scan.aggPushed == Some(Seq("count", "min", "max")),
      s"aggregation not absorbed: ${scan.aggPushed}")
    assert(scan.readSchema().fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType) && scan.readSchema().size == 3,
      "agg-mode scan must read the pre-aggregated schema")
    // filter pushdown composes: ids [4096, 200000] cover splits 0..12
    assert(scan.minId == 4096L && scan.maxId == 200000L)
    assert(scan.planInputPartitions().length == 13)
  }

  // ---------------------------------------------------------------- q622

  test("q622 runtime filtering: In(id) prunes splits; join result exact") {
    // unit level: a runtime In(id, ...) drops every split holding none
    // of the probe ids
    val scan = new GenScan(
      262144L, 16, Seed, gen.schema, Array.empty, 0L, 262143L)
    assert(scan.planInputPartitions().length == 16)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array[Any](5L, 100000L, 100001L))))
    val kept = scan.planInputPartitions().map(_.asInstanceOf[graft.sources.v2.GenInputPartition])
    assert(kept.length == 2, s"expected 2 surviving splits, got ${kept.length}")
    assert(kept.exists(p => p.lo <= 5 && 5 < p.hi) &&
      kept.exists(p => p.lo <= 100000 && 100000 < p.hi))

    // integration: the joined aggregate matches a driver fold over the
    // probe ids (correctness never depends on whether pruning fired)
    val df = SparkEntry.queries("q622_dsv2_runtime_filter")(spark, sfDir)
    val row = df.collect().head
    val probeIds = graft.sources.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0) * 53L)
      .filter(id => id >= 0 && id < 262144L)
    val vals = probeIds.map(id => GenSource.value(id, Seed))
    val cats = probeIds.map(id => GenSource.category(id, Seed)).toSet
    assert(row.getLong(0) == probeIds.length.toLong)
    assert(row.getLong(1) == vals.sum)
    assert(row.getLong(2) == cats.size.toLong)

    // the scan must declare the runtime-filterable attribute
    val planScan = genScanOf(df)
    assert(planScan.filterAttributes().map(_.describe()).toSeq == Seq("id"))
  }

  // ------------------------------------------------- pruning standalone

  test("single-column projection prunes the read schema to that column") {
    val df = gen.select(col("category"))
    val scan = genScanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("category"))
    assert(scan.planInputPartitions().length == 16, "no filter -> all splits planned")
    assert(df.distinct().count() == 8L)
  }
}
