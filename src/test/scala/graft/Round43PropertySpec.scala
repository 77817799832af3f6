package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-43 differential sweeps — driver references for the learned-
  * index fit, GPD tail moments, binned MMD, Bartlett's χ², and the
  * temperature sweep. The q525 reference ranks keys by a direct global
  * sort — independent of the query's bucket-offset rank construction.
  */
class Round43PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q525

  test("q525 learned index equals the direct-sort OLS replay") {
    val keys = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val n = keys.length.toLong
    val mn = keys.head
    val mx = keys.last
    val xy = keys.zipWithIndex.map { case (k, i) =>
      ((k - mn).toDouble / (mx - mn), (i + 1).toDouble / n)
    }
    val sx = xy.map(p => qiL(p._1)).sum
    val sy = xy.map(p => qiL(p._2)).sum
    val sxy = xy.map(p => qiL(p._1 * p._2)).sum
    val sxx = xy.map(p => qiL(p._1 * p._1)).sum
    val a = (sxy.toDouble / 1048576.0 - sx.toDouble * sy / 1048576.0 / 1048576.0 / n) /
      (sxx.toDouble / 1048576.0 - sx.toDouble * sx / 1048576.0 / 1048576.0 / n)
    val icpt = sy.toDouble / 1048576.0 / n - a * sx / 1048576.0 / n
    val errs = xy.map { case (xu, yu) => math.abs(yu - (a * xu + icpt)) * n }
    val expected = (n, snapD(a), snapD(icpt), snapD(errs.max),
      snapD(errs.map(e => qiL(e)).sum.toDouble / 1048576.0 / n))
    val got = SparkEntry.queries("q525_learned_index")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).head
    assert(got == expected, s"got $got expected $expected")
    // a near-uniform key space fits near the identity line
    assert(got._2 > 0.5 && got._2 < 2.0)
  }

  // ---------------------------------------------------------------- q526

  test("q526 GPD moments equal the exceedance fold") {
    val xs = graft.sources.Tables.events(spark, sfDir)
      .select("value").collect().map(_.getDouble(0))
    val n = xs.length.toLong
    val p = (9 * n + 9) / 10
    val sortedDistinct = xs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.length.toLong) }
    var cum = 0L
    val u = sortedDistinct.collectFirst {
      case (v, c) if { cum += c; cum >= p } => v
    }.get
    val ex = xs.filter(_ > u).map(_ - u)
    val ne = ex.length.toLong
    val s1 = ex.map(e => qiL(e)).sum
    val s2 = ex.map(e => qiL(e * e)).sum
    val m = s1.toDouble / 1048576.0 / ne
    val v = (s2.toDouble / 1048576.0 -
      (s1.toDouble / 1048576.0 / ne) * (s1.toDouble / 1048576.0 / ne) * ne) / (ne - 1)
    val xi = (1.0 - m * m / v) / 2
    val expected = (snapD(u), ne, snapD(m), snapD(xi), snapD(m * (1.0 - xi)),
      if (xi > 0.0) 1 else 0)
    val got = SparkEntry.queries("q526_gpd_moments")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).head
    assert(got == expected, s"got $got expected $expected")
    // roughly 10% of the sample exceeds the p90 threshold
    assert(ne <= n / 10 + 1)
  }

  // ---------------------------------------------------------------- q527

  test("q527 binned MMD equals the kernel fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g",
        "CAST(round(value) AS BIGINT) AS r")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val ca = ev.filter(_._1 == 0).groupBy(_._2).map { case (r, g) => (r, g.length.toLong) }
    val cb = ev.filter(_._1 == 1).groupBy(_._2).map { case (r, g) => (r, g.length.toLong) }
    val n = ca.values.sum
    val m = cb.values.sum
    def ksum(x: Map[Long, Long], y: Map[Long, Long], gam: Long): Long =
      (for ((ra, caa) <- x; (rb, cbb) <- y) yield
        qiL(caa * cbb * math.exp(-((ra - rb) * (ra - rb)).toDouble / (2.0 * gam * gam)))).sum
    val expected = Seq(10L, 50L).map { gam =>
      val xx = ksum(ca.toMap, ca.toMap, gam).toDouble / 1048576.0 / n / n
      val yy = ksum(cb.toMap, cb.toMap, gam).toDouble / 1048576.0 / m / m
      val xy = ksum(ca.toMap, cb.toMap, gam).toDouble / 1048576.0 / n / m
      // the query's mmd2 text evaluates the three means independently
      val mmd2 = ksum(ca.toMap, ca.toMap, gam).toDouble / 1048576.0 / n / n +
        ksum(cb.toMap, cb.toMap, gam).toDouble / 1048576.0 / m / m -
        2.0 * ksum(ca.toMap, cb.toMap, gam) / 1048576.0 / n / m
      (gam, n, m, snapD(xx), snapD(yy), snapD(xy), snapD(mmd2))
    }
    val got = SparkEntry.queries("q527_mmd_binned")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // MMD^2 is non-negative up to quantization slack
    assert(got.forall(_._7 > -1e-4))
  }

  // ---------------------------------------------------------------- q528

  test("q528 Bartlett equals the sufficient-statistics replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1) / 100.0))
    val per = ev.groupBy(_._1).values.map { g =>
      val zs = g.map(_._2)
      val n = zs.length.toLong
      val s1 = zs.map(z => qiL(z)).sum
      val s2 = zs.map(z => qiL(z * z)).sum
      val v = (s2.toDouble / 1048576.0 -
        (s1.toDouble / 1048576.0 / n) * (s1.toDouble / 1048576.0 / n) * n) / (n - 1)
      (n, v)
    }.toSeq
    val k = per.length.toLong
    val nt = per.map(_._1).sum
    val swv = per.map { case (n, v) => qiL((n - 1) * v) }.sum
    val slv = per.map { case (n, v) => qiL((n - 1) * math.log(v)) }.sum
    val sinv = per.map { case (n, _) => qiL(1.0 / (n - 1)) }.sum
    val c2 = ((nt - k) * math.log(swv.toDouble / 1048576.0 / (nt - k)) -
      slv.toDouble / 1048576.0) /
      (1.0 + (sinv.toDouble / 1048576.0 - 1.0 / (nt - k)) / (3 * (k - 1)))
    val expected = (k, nt, k - 1, snapD(c2),
      if (c2 > 9.487729036781154) 1 else 0)
    val got = SparkEntry.queries("q528_bartlett")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q529

  test("q529 temperature sweep equals the exact-weight fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val cw = docs.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val ranked = cw.toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, c), i) => (w, c, i + 1L) }
    val expected = Seq(0.5, 1.0, 2.0).map { tau =>
      def weight(c: Long): Long = tau match {
        case 0.5 => c * c
        case 1.0 => c
        case _ => qiL(math.sqrt(c.toDouble))
      }
      val z = ranked.map(r => weight(r._2)).sum
      val hq = ranked.map { r =>
        val w = weight(r._2)
        qiL(-(w.toDouble / z) * math.log(w.toDouble / z))
      }.sum
      val top = ranked.filter(_._3 <= 100).map(r => weight(r._2)).sum
      (snapD(tau), ranked.length.toLong, snapD(hq.toDouble / 1048576.0),
        snapD(math.exp(hq.toDouble / 1048576.0)), snapD(top.toDouble / z))
    }
    val got = SparkEntry.queries("q529_temperature_sweep")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // sharpening (tau=1/2) concentrates mass; flattening (tau=2) spreads it
    assert(got.head._5 >= got(1)._5 && got(1)._5 >= got(2)._5)
    assert(got.head._3 <= got(1)._3 && got(1)._3 <= got(2)._3)
  }
}
