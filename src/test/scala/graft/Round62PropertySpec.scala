package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-62 differential sweeps — driver references for the encoding
  * advisor, partition-key advisor and Bloom sizing audit. Independent
  * Scala recomputation from collected rows, replicating the SQL's
  * operation order bit-exactly.
  */
class Round62PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  // ---------------------------------------------------------------- q602

  test("q602 encoding advisor equals the NDV fold") {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr(cols.map(c => s"CAST($c AS STRING) AS $c"): _*)
      .collect()
    val expected = cols.sorted.map { c =>
      val idx = cols.indexOf(c)
      val vals = li.map(_.getString(idx))
      val n = vals.length.toLong
      val ndv = vals.distinct.length.toLong
      (c, n, ndv, snapD(ndv.toDouble / n), if (16 * ndv <= n) 1 else 0)
    }
    val got = SparkEntry.queries("q602_encoding_advisor")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the flag columns (returnflag/linestatus) are always dict-worthy
    assert(got.filter(r => Set("l_returnflag", "l_linestatus")
      .contains(r._1)).forall(_._5 == 1))
    // Plan contract (r13 optimization round, MEASURED): the multi-
    // distinct one-pass rewrite planned a 9-way Expand over the full
    // scan (every row multiplied 9x, two Exchanges) and benched 2.53 s
    // vs the branch-per-column shape's 0.16 s at sf0.1 — and the Expand
    // pays the same row blow-up at 100 TB, while each UNION branch
    // scans one column under columnar pruning. Assert the Expand-free
    // shape instead: one (pruned) scan per audited column, NO Expand.
    val tree = graft.plans.PlanFingerprint
      .normalizedTree(SparkEntry.queries("q602_encoding_advisor")(spark, sfDir))
    assert(!tree.linesIterator.exists(_.trim.startsWith("Expand")),
      "q602 plans an Expand — the multi-distinct row blow-up is back")
  }

  // ---------------------------------------------------------------- q603

  test("q603 partition advisor equals the skew fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "event_type", "user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keyed: Seq[(String, String)] =
      ev.map(e => "day" -> Math.floorDiv(e._1, 86400000000L).toString) ++
        ev.map(e => "hour_of_day" -> (Math.floorDiv(e._1, 3600000000L) % 24).toString) ++
        ev.map(e => "event_type" -> e._2) ++
        ev.map(e => "user_mod_256" -> (e._3 % 256).toString)
    val expected = keyed.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, xs) =>
      val parts = xs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val nParts = parts.length.toLong
      val mx = parts.max
      val tot = parts.sum
      val skew = mx.toDouble * nParts / tot
      (k, nParts, mx, snapD(skew), if (skew > 4.0) 1 else 0,
        if (nParts > 10000) 1 else 0)
    }
    val got = SparkEntry.queries("q603_partition_advisor")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // skew is at least 1 by construction (max >= mean)
    assert(got.forall(_._4 >= 1.0 - 1e-9))
  }

  // ---------------------------------------------------------------- q604

  test("q604 Bloom sizing equals the closed-form fold") {
    val build = graft.sources.Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_acctbal").collect()
      .filter(_.getDouble(1) < 0).map(_.getLong(0)).toSet
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey").collect().map(_.getLong(0))
    val nBuild = build.size.toLong
    val nProbe = orders.length.toLong
    val nHits = orders.count(build.contains).toLong
    val mBits = math.ceil(7 * nBuild / math.log(2.0)).toLong
    val hitRate = nHits.toDouble / nProbe
    val expected = (nBuild, 7, mBits, snapD(mBits.toDouble / nBuild), nProbe,
      nHits, snapD(hitRate), snapD(1 - (hitRate + (1 - hitRate) / 128)))
    val got = SparkEntry.queries("q604_bloom_sizing")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7))).head
    assert(got == expected, s"got $got expected $expected")
    // ~10.1 bits/key at 2^-7 FPR — the textbook constant
    assert(got._4 > 10.0 && got._4 < 10.2)
  }
}
