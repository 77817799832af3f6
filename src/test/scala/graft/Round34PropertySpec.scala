package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-34 differential sweeps — the q490 zero-exchange plan pin and
  * a driver reference for the pruning curve.
  */
class Round34PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  test("q490 joins bucket-to-bucket: SMB, no exchange on the join key") {
    val df = graft.queries.Round34.bucketSmbJoined(spark, sfDir)
    df.collect() // force AQE to finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMB in:\n$plan")
    assert("Bucketed: true".r.findAllIn(plan).length >= 2,
      "both scans must carry the bucket spec")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      "fact side must not re-shuffle on the join key")
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      "dim side must not re-shuffle on the join key")
    // and the layout is invisible in results: equal to the plain join
    val plain = graft.sources.Tables.orders(spark, sfDir)
      .join(graft.sources.Tables.customer(spark, sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)")).as("total_cents"))
      .orderBy("c_nationkey")
      .collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("q491 pruning curve equals the driver retention fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)))
    val scored = docs.map { case (id, ws) => (id, ws.distinct.length.toLong, ws) }
    val ranked = scored.sortBy { case (id, s, _) => (-s, id) }.zipWithIndex
      .map { case ((id, _, ws), i) => (i + 1L, id, ws) }
    val n = ranked.length.toLong
    val firstRank = scala.collection.mutable.Map.empty[String, Long]
    ranked.foreach { case (rnk, _, ws) =>
      ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).foreach { g =>
        if (!firstRank.contains(g) || firstRank(g) > rnk) firstRank(g) = rnk
      }
    }
    val expected = Seq(25L, 50L, 75L, 100L).map { q =>
      val rMax = (q * n + 99) / 100
      val kept = ranked.filter(_._1 <= rMax)
      val toks = kept.map(_._3.length.toLong).sum
      val grams = kept.map(k => math.max(k._3.length - 2, 0).toLong).sum
      val types = firstRank.values.count(_ <= rMax).toLong
      (q, kept.length.toLong, toks, types, snapD(types.toDouble / grams))
    }
    val got = SparkEntry.queries("q491_pruning_curve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // more retention never loses gram types
    assert(got.map(_._4) == got.map(_._4).sorted)
  }
}
