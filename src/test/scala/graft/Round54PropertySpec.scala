package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-54 differential sweeps — driver references for the Shewhart X̄
  * control chart, the TOST equivalence test and the Bland–Altman
  * stored-vs-recomputed agreement audit. Independent Scala recomputation
  * from collected rows, replicating the SQL's operation order bit-exactly.
  */
class Round54PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q579

  test("q579 X̄ chart equals the zero-filled subgroup fold") {
    val hhs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 3600000000L))
    val mn = hhs.min
    val mx = hhs.max
    val cnt = hhs.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val perDay = (mn to mx).map(h => (h - mn) / 24 -> cnt.getOrElse(h, 0L))
      .groupBy(_._1).toSeq.map { case (d, xs) =>
        (d, xs.length.toLong, xs.map(_._2).sum, xs.map(x => x._2 * x._2).sum)
      }
    val full = perDay.filter(_._2 == 24L).sortBy(_._1)
    val k = full.length.toLong
    val gs = full.map(_._3).sum
    val ssw24 = full.map { case (_, _, sy, syy) => 24L * syy - sy * sy }.sum
    val mu = gs.toDouble / (24 * k)
    val w = 3.0 * math.sqrt(ssw24.toDouble / 24 / (k * 23) / 24)
    val expected = full.map { case (d, _, sy, _) =>
      val xbar = sy.toDouble / 24
      (d, snapD(xbar), snapD(mu), snapD(mu - w), snapD(mu + w),
        if (xbar < mu - w || xbar > mu + w) 1 else 0)
    }
    val got = SparkEntry.queries("q579_xbar_chart")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // limits bracket the center line; at least one full day exists
    assert(got.nonEmpty && got.forall(r => r._4 < r._3 && r._3 < r._5))
  }

  // ---------------------------------------------------------------- q580

  test("q580 TOST equals the Welch two-one-sided fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(e => e._1 == "click" || e._1 == "view")
    def mom(t: String): (Long, Long, Long) = {
      val xs = ev.filter(_._1 == t).map(_._2)
      (xs.length.toLong, xs.map(qiL).sum, xs.map(v => qiL(v * v)).sum)
    }
    val (na, sa, qa) = mom("click")
    val (nb, sb, qb) = mom("view")
    val ma = sa.toDouble / 1048576.0 / na
    val mb = sb.toDouble / 1048576.0 / nb
    val va = (qa.toDouble / 1048576.0 -
      (sa.toDouble / 1048576.0) * (sa.toDouble / 1048576.0) / na) / (na - 1) / na
    val vb = (qb.toDouble / 1048576.0 -
      (sb.toDouble / 1048576.0) * (sb.toDouble / 1048576.0) / nb) / (nb - 1) / nb
    val delta = ma - mb
    val se = math.sqrt(va + vb)
    val tLo = (delta + 0.05) / se
    val tHi = (delta - 0.05) / se
    val expected = (na, nb, snapD(delta), snapD(se), snapD(tLo), snapD(tHi),
      if (tLo > 1.645 && tHi < -1.645) 1 else 0)
    val got = SparkEntry.queries("q580_tost")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6))).head
    assert(got == expected, s"got $got expected $expected")
    // the two one-sided statistics straddle the plain t = delta/se
    assert(got._5 > got._6)
  }

  // ---------------------------------------------------------------- q581

  test("q581 Bland–Altman equals the cent-exact reconciliation fold") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val dcs = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS sc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ok, sc) => li.get(ok).map(cc => sc - cc) }
    val n = dcs.length.toLong
    val sd = dcs.sum
    val sdd = dcs.map(d => BigInt(d) * d).sum // >63 bits at bench scale
    val bias = sd.toDouble / n / 100
    val sdev = math.sqrt((sdd.toDouble - sd.toDouble * sd / n) / (n - 1)) / 100
    val nOut = dcs.count(d =>
      d.toDouble / 100 < bias - 1.96 * sdev || d.toDouble / 100 > bias + 1.96 * sdev).toLong
    val expected = (n, snapD(bias), snapD(bias - 1.96 * sdev),
      snapD(bias + 1.96 * sdev), nOut, snapD(nOut.toDouble / n))
    val got = SparkEntry.queries("q581_bland_altman")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // every order reconciles through the join (orders without lines aside)
    assert(got._1 > 0 && got._5 <= got._1)
  }
}
