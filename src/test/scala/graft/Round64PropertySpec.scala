package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.{PlanFingerprint, PlanGuard}
import graft.sources.Tables

/** Round-64 differential sweeps + the planner wiring the round's trio is
  * about: q608's incremental maintenance against BOTH a driver-side
  * union-find and the engine's own batch contraction; q609's size table
  * against independent per-table actions AND against the physical plans
  * of the canonical dim⋈fact joins (`PlanGuard.broadcastMisses` clean,
  * BroadcastHashJoin actually placed); q610's boundaries against a
  * driver-side order-statistic fold AND the RangePartitioning exchange
  * `repartitionByRange` really produces.
  */
class Round64PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  // ---------------------------------------------------------------- q608

  test("q608 incremental CC equals driver union-find AND the batch contraction") {
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sfDir))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver union-find with path compression; rep = component minimum
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val expected = parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      ms.min -> ms.size.toLong
    }
    val got = SparkEntry.queries("q608_incremental_cc")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")

    // engine-level differential: the maintenance path must be
    // bit-identical to the batch star contraction over the full pair set
    val batch = Dedup
      .connectedComponentsStar(Dedup.minhashPairs(Tables.documents(spark, sfDir)))
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch, "incremental != batch contraction")
  }

  // ---------------------------------------------------------------- q609

  test("q609 size estimates equal independent per-table actions") {
    val expected = Seq(
      ("region", 4, Seq("r_name")),
      ("nation", 8, Seq("n_name")),
      ("customer", 20, Seq("c_name", "c_mktsegment")),
      ("supplier", 20, Seq("s_name")),
      ("part", 20, Seq("p_name", "p_brand", "p_type")),
      ("orders", 32, Seq("o_orderstatus", "o_orderpriority")),
      ("lineitem", 68, Seq("l_returnflag", "l_linestatus"))
    ).map { case (t, fixed, strs) =>
      val df = Tables.table(spark, sfDir, t)
      val n = df.count()
      val strBytes = df
        .select(strs.map(c => sum(length(col(c)).cast("long")).as(c)): _*)
        .collect().head.toSeq.map(_.asInstanceOf[Long]).sum
      val est = fixed * n + strBytes
      (t, n, est, if (est <= 10485760L) 1 else 0,
        if (est <= 10485760L) "broadcast" else "shuffle")
    }.sortBy(_._1)
    val got = SparkEntry.queries("q609_broadcast_advisor")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getString(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q609 advice matches the physical plans of the canonical dim joins") {
    // Every table the advisor calls broadcastable at this SF must
    // actually come back as the build side of a BroadcastHashJoin when
    // joined to a fact — the advisor is wired to plan reality, not just
    // to its own arithmetic.
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val joins = Seq(
      "orders ⋈ customer" ->
        orders.join(customer, orders("o_custkey") === customer("c_custkey")),
      "lineitem ⋈ part" ->
        lineitem.join(part, lineitem("l_partkey") === part("p_partkey")))
    joins.foreach { case (name, df) =>
      val misses = PlanGuard.broadcastMisses(df)
      assert(misses.isEmpty, s"$name: $misses")
      assert(PlanFingerprint.normalizedTree(df).contains("BroadcastHashJoin"),
        s"$name did not plan a broadcast hash join at $sfDir")
    }
  }

  // ---------------------------------------------------------------- q610

  test("q610 range bounds equal the driver order-statistic fold") {
    val ids = Tables.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val sorted = ids.sorted
    val bounds = (1 to 7).map(i => sorted((((i * n + 7) / 8) - 1).toInt))
    val rangeBuckets = ids.groupBy(v => 1 + bounds.count(_ < v))
      .map { case (b, xs) => b -> xs.length.toLong }
    val hashBuckets = ids.groupBy(v => (1 + v % 8).toInt)
      .map { case (b, xs) => b -> xs.length.toLong }
    def rows(method: String, m: Map[Int, Long]) = {
      val mx = m.values.max
      m.toSeq.sorted.map { case (b, c) =>
        (method, b, c, snapD(mx.toDouble * 8 / m.values.sum)) }
    }
    val expected = (rows("hash_mod", hashBuckets) ++
      rows("range_exact", rangeBuckets)).sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q610_range_bounds")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // exact range cuts can never be MORE skewed than leaving the hot
    // values where the mod sends them unless duplicates force it; both
    // skews are >= 1 by construction
    got.foreach(r => assert(r._4 >= 1.0 - 1e-12))
  }

  // ---------------------------------------------------------------- q611

  test("q611 incremental near-dup equals the driver trigram fold AND the filtered batch run") {
    // driver fold: exact string-trigram Jaccard over all pairs touching
    // the delta slice (doc_id % 10 >= 8), mirroring the oracle's
    // inverted-index semantics from first principles
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.map { case (id, text) =>
      val ts = text.split(" ", -1)
      id -> (0 until math.max(0, ts.length - 2))
        .map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toSet
    }.filter(_._2.nonEmpty)
    val expected = (for {
      i <- grams.indices; j <- (i + 1) until grams.length
      (a, ga) = grams(i); (b, gb) = grams(j)
      if a % 10 >= 8 || b % 10 >= 8
      inter = (ga intersect gb).size
      jac = inter.toDouble / (ga.size + gb.size - inter)
      if jac >= 0.8
      (lo, hi) = if (a < b) (a, b) else (b, a)
    } yield (lo, hi, BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q611_incremental_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == expected, s"got $got expected $expected")

    // engine differential: incremental ≡ full batch pipeline filtered to
    // delta-touching pairs
    val full = Dedup.minhashPairs(Tables.documents(spark, sfDir))
      .filter(col("doc_a") % 10 >= 8 || col("doc_b") % 10 >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == full, "incremental != filtered batch pipeline")
  }

  test("q610's bounds drive a real RangePartitioning exchange") {
    val df = Tables.events(spark, sfDir).repartitionByRange(8, col("user_id"))
    assert(PlanFingerprint.normalizedTree(df).contains("ShuffleExchange[RangePartitioning]"),
      "repartitionByRange did not produce a RangePartitioning exchange")
  }
}
