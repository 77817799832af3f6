package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-47 differential sweeps. q553's test is the catalogue checking
  * itself: the scorecard's energy and MMD cells must equal the
  * STANDALONE q538/q527 results — independently written SQL agreeing
  * exactly — plus driver folds for the KS/W1/JS cells.
  */
class Round47PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def md5i8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def dailyOrderCounts: IndexedSeq[Long] = {
    val ds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
  }

  // ---------------------------------------------------------------- q548

  test("q548 interval coverage equals the calibration/test fold") {
    val ys = dailyOrderCounts
    val n = ys.length.toLong
    val diffs = ys.indices.drop(1).map(i => (i.toLong, math.abs(ys(i) - ys(i - 1))))
    val cut = (7 * n) / 10
    val cal = diffs.filter(_._1 < cut).map(_._2).sorted
    val test = diffs.filter(_._1 >= cut).map(_._2)
    val expected = Seq(50L, 90L).map { nom =>
      val h = cal(((nom * cal.length + 99) / 100 - 1).toInt)
      val hit = test.count(_ <= h).toLong
      (nom, h, test.length.toLong, snapD(hit.toDouble / test.length),
        snapD(hit.toDouble / test.length - nom.toDouble / 100))
    }
    val got = SparkEntry.queries("q548_interval_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // wider nominal, wider band, more coverage
    assert(got(1)._2 >= got(0)._2 && got(1)._4 >= got(0)._4)
  }

  // ---------------------------------------------------------------- q549

  test("q549 Kendall W equals the weekly rank fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(Math.floorDiv(r.getLong(1), 86400000000L), 7L)))
    val types = ev.map(_._1).distinct.sorted
    val weeks = ev.map(_._2).distinct
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rj = types.map { t =>
      t -> weeks.map { w =>
        val mine = cnt.getOrElse((t, w), 0L)
        (types.count { o =>
          val oc = cnt.getOrElse((o, w), 0L)
          oc > mine || (oc == mine && o < t)
        } + 1).toLong
      }.sum
    }.toMap
    val k = weeks.length.toLong
    val m = types.length.toLong
    val ss = types.map(t => { val d = 2 * rj(t) - k * (m + 1); d * d }).sum
    val w = 3.0 * ss / (k.toDouble * k * m * (m * m - 1))
    val chi2 = k.toDouble * (m - 1) * w
    val expected = (k, m, snapD(w), snapD(chi2),
      if (chi2 > 9.487729036781154) 1 else 0)
    val got = SparkEntry.queries("q549_kendall_w")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._3 >= 0.0 && got._3 <= 1.0 + 1e-9)
  }

  // ---------------------------------------------------------------- q550

  test("q550 regression adjustment equals the Cramer replay") {
    val u = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(round(value * CAST(100 AS DOUBLE)) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, xs) =>
        (xs.filter(_._2 == "purchase").map(_._3).sum,
          xs.count(_._2 == "click").toLong, xs.count(_._2 == "view").toLong)
      }.toSeq
    val n = u.length.toLong
    def S(f: ((Long, Long, Long)) => Long): Long = u.map(f).sum
    val (s1, s2, sy) = (S(_._2), S(_._3), S(_._1))
    val c11 = S(r => r._2 * r._2).toDouble - s1.toDouble * s1 / n
    val c22 = S(r => r._3 * r._3).toDouble - s2.toDouble * s2 / n
    val c12 = S(r => r._2 * r._3).toDouble - s1.toDouble * s2 / n
    val c1y = S(r => r._2 * r._1).toDouble - s1.toDouble * sy / n
    val c2y = S(r => r._3 * r._1).toDouble - s2.toDouble * sy / n
    val cyy = S(r => r._1 * r._1).toDouble - sy.toDouble * sy / n
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val r2 = (b1 * c1y + b2 * c2y) / cyy
    val expected = (n, snapD(b1 / 100), snapD(b2 / 100), snapD(r2), snapD(1.0 - r2))
    val got = SparkEntry.queries("q550_regression_adjustment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._4 >= 0.0 && got._4 <= 1.0)
  }

  // ---------------------------------------------------------------- q551

  test("q551 compaction model equals the layout fold") {
    val dds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val expected = Seq(("1_daily", 1L), ("2_weekly", 7L), ("3_monthly", 30L))
      .map { case (name, unit) =>
        val files = dds.groupBy(d => d / unit).values.map(_.length.toLong).toSeq
        val nf = files.length.toLong
        val sorted = files.sorted
        val p50 = sorted(((nf + 1) / 2 - 1).toInt)
        val cost = nf * 1000 + files.sum
        (name, nf, p50, snapD(files.count(_ < 100).toDouble / nf), cost)
      }
    val c0 = expected.head._5
    val exp2 = expected.map { case (n, nf, p, s, c) =>
      (n, nf, p, s, c, snapD(c.toDouble / c0))
    }
    val got = SparkEntry.queries("q551_compaction_model")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == exp2, s"got $got expected $exp2")
    // compaction only reduces modeled scan cost
    assert(got.map(_._5) == got.map(_._5).sorted.reverse)
  }

  // ---------------------------------------------------------------- q552

  test("q552 switchback equals the period-level replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "value").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 3600000000L), r.getDouble(1)))
    val per = ev.groupBy(_._1).toSeq.map { case (hh, xs) =>
      val sv = xs.map(x => qiL(x._2)).sum
      (md5i8(s"sb:$hh") % 2, qiL(sv.toDouble / 1048576.0 / xs.length))
    }
    def stats(arm: Long): (Long, Double, Double) = {
      val ms = per.filter(_._1 == arm).map(_._2)
      val k = ms.length.toLong
      val s1 = ms.sum
      val s2 = ms.map(m => qiL((m.toDouble / 1048576.0) * (m.toDouble / 1048576.0))).sum
      val mean = s1.toDouble / 1048576.0 / k
      val v = (s2.toDouble / 1048576.0 -
        (s1.toDouble / 1048576.0 / k) * (s1.toDouble / 1048576.0 / k) * k) / (k - 1)
      (k, mean, v)
    }
    val (kt, mt, vt) = stats(1)
    val (kc, mc, vc) = stats(0)
    val se = math.sqrt(vt / kt + vc / kc)
    val t = (mt - mc) / se
    val expected = (kt, kc, snapD(mt), snapD(mc), snapD(mt - mc), snapD(se),
      snapD(t), if (math.abs(t) > 1.96) 1 else 0)
    val got = SparkEntry.queries("q552_switchback")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getInt(7))).head
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q553

  test("q553 scorecard cells equal the standalone queries and driver folds") {
    val sc = SparkEntry.queries("q553_drift_scorecard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).head
    // the catalogue cross-check: independently written SQL must agree
    val energyStandalone = SparkEntry.queries("q538_energy_distance")(spark, sfDir)
      .collect().map(_.getDouble(5)).head
    assert(sc._5 == energyStandalone,
      s"scorecard energy ${sc._5} != q538 $energyStandalone")
    val mmdStandalone = SparkEntry.queries("q527_mmd_binned")(spark, sfDir)
      .collect().filter(_.getLong(0) == 50L).map(_.getDouble(6)).head
    assert(sc._6 == mmdStandalone,
      s"scorecard mmd ${sc._6} != q527(g=50) $mmdStandalone")
    // driver folds for the remaining cells
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g", "value")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val a = ev.filter(_._1 == 0).map(r => math.round(r._2 * 100.0))
    val b = ev.filter(_._1 == 1).map(r => math.round(r._2 * 100.0))
    val (na, nb) = (a.length.toLong, b.length.toLong)
    assert(sc._1 == na && sc._2 == nb)
    val axis = (a ++ b).distinct.sorted
    def cdf(xs: Array[Long])(v: Long): Long = xs.count(_ <= v).toLong
    val ks = axis.map(v => math.abs(cdf(a)(v) * nb - cdf(b)(v) * na)).max
    assert(sc._3 == snapD(ks.toDouble / (na.toDouble * nb)))
    val w1 = axis.sliding(2).collect { case Array(u, v) =>
      math.abs(cdf(a)(u) * nb - cdf(b)(u) * na) * (v - u)
    }.sum
    assert(sc._4 == snapD(w1.toDouble / (na.toDouble * nb) / 100))
    // JS fold on dollar bins
    val ja = ev.filter(_._1 == 0).map(r => math.round(r._2))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val jb = ev.filter(_._1 == 1).map(r => math.round(r._2))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val bins = (ja.keySet ++ jb.keySet).toSeq
    def klTerm(p: Double, q: Double): Long =
      qiL(p * math.log(p / ((p + q) / 2)))
    val kla = bins.map { k =>
      val p = ja.getOrElse(k, 0L).toDouble / na
      val q = jb.getOrElse(k, 0L).toDouble / nb
      if (ja.getOrElse(k, 0L) > 0) klTerm(p, q) else 0L
    }.sum
    val klb = bins.map { k =>
      val p = jb.getOrElse(k, 0L).toDouble / nb
      val q = ja.getOrElse(k, 0L).toDouble / na
      if (jb.getOrElse(k, 0L) > 0) klTerm(p, q) else 0L
    }.sum
    assert(sc._7 == snapD((kla.toDouble / 1048576.0 + klb.toDouble / 1048576.0) / 2))
    // JS is bounded by ln 2
    assert(sc._7 >= 0.0 && sc._7 <= math.log(2.0) + 1e-9)
  }
}
