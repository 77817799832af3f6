package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two runtime re-plan behaviors the 100 TB design leans on, pinned
  * as executed-plan facts: AQE splits a skewed join partition instead of
  * letting one straggler task carry the hot key, and a join against a
  * filtered dimension prunes the fact table's partitions at runtime
  * (dynamic partition pruning) so the scan never reads the dead
  * partitions.
  */
class ScaleBehaviorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("AQE splits the skewed partition of a sort-merge join (skew=true in the final plan)") {
    // one hot key carrying HALF the rows (the classic power-law head)
    val left = spark.range(60000)
      .select(when($"id" % 2 === 0, lit(7L)).otherwise($"id" % 37).as("k"),
        concat(lit("payload_padding_padding_padding_"), $"id").as("pad"))
    val right = spark.range(3000)
      .select(($"id" % 37).as("k"), concat(lit("r_"), $"id").as("rpad"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    ) {
      // the inspected QueryExecution must be the one that RAN: AQE only
      // finalizes (and records the skew split in) the executed instance.
      // Aggregate over the payloads so column pruning can't strip the
      // fat columns whose bytes make the hot partition detectably skewed.
      val agg = left.join(right, "k")
        .agg(sum(length($"pad") + length($"rpad")).as("bytes"))
      assert(agg.collect()(0).getLong(0) > 0)
      val finalPlan = agg.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n$finalPlan")
    }
  }

  test("dynamic partition pruning: a filtered dim join scans only matching fact partitions") {
    val dir = Files.createTempDirectory("graft_dpp").resolve("fact").toString
    spark.range(20000)
      .select($"id", ($"id" % 10).cast("int").as("part_key"), ($"id" * 1.1).as("v"))
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // filter on a NON-key column: a key filter would be statically
    // inferred onto the partition column (constraint propagation) and
    // pruned without any runtime mechanism — DPP exists for exactly the
    // case where the selected keys are only known by running the dim scan
    val dim = spark.range(10)
      .select($"id".cast("int").as("d_key"), concat(lit("n"), $"id").as("d_name"))
      .filter($"d_name".isin("n3", "n4"))
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // keep the dim broadcastable (default) so DPP reuses the broadcast
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "true"
    ) {
      val joined = fact.join(dim, fact("part_key") === dim("d_key"))
      val n = joined.count()
      assert(n == 4000L, s"expected 2 of 10 partitions' rows, got $n")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning subquery in the scan:\n$plan")
    }
  }

  test("runtime bloom filter: a selective dim filter injects row-level fact pruning") {
    // DPP prunes PARTITIONS; the runtime bloom filter is its row-level
    // sibling for joins on NON-partition columns — the dim side's join
    // keys build a bloom filter that drops fact rows before the shuffle.
    // At 100 TB this is the difference between shuffling the full fact
    // table and shuffling the ~matching slice.
    val dir = Files.createTempDirectory("graft_bloom").resolve("fact").toString
    spark.range(200000)
      .select($"id", ($"id" % 5000).as("join_key"), ($"id" * 1.1).as("v"))
      .write.parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(5000)
      .select($"id".as("d_key"), concat(lit("n"), $"id" % 100).as("d_name"))
      .filter($"d_name" === "n3") // selective: 1% of dim keys survive
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // shuffle join: the bloom's target
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"
    ) {
      val joined = fact.join(dim, fact("join_key") === dim("d_key"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect()(0).getLong(0) == 2000L) // 50 keys × 40 rows
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"no runtime bloom filter on the fact scan:\n$plan")
    }
  }
}
