package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-48 differential sweeps — driver references for the GEV
  * L-moment fit (direct-sort ranks, independent of the query's
  * bucket-offset construction), Engle–Granger, the KM/RMST integral
  * (sequential curve walk), CRPS (direct per-day ensemble fold),
  * Erlang-B (the plain sequential recursion), and the η² ladder.
  */
class Round48PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def dailyOrderCounts: IndexedSeq[Long] = {
    val ds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
  }

  // ---------------------------------------------------------------- q554

  test("q554 GEV L-moments equal the direct-sort PWM fold") {
    val ys = dailyOrderCounts
    val maxima = ys.grouped(7).filter(_.length == 7).map(_.max).toSeq.sorted
    val n = maxima.length.toLong
    val s0 = maxima.sum
    val s1 = maxima.zipWithIndex.map { case (m, i) => i.toLong * m }.sum
    val s2 = maxima.zipWithIndex.map { case (m, i) => i.toLong * (i - 1L) * m }.sum
    val l1 = s0.toDouble / n
    val l2 = 2.0 * s1 / (n.toDouble * (n - 1)) - s0.toDouble / n
    val l3 = 6.0 * s2 / (n.toDouble * (n - 1) * (n - 2)) -
      6.0 * s1 / (n.toDouble * (n - 1)) + s0.toDouble / n
    val t3 = l3 / l2
    val cc = 2.0 / (3 + t3) - math.log(2.0) / math.log(3.0)
    val k = 7.8590 * cc + 2.9554 * cc * cc
    val expected = (n, snapD(l1), snapD(l2), snapD(t3), snapD(k),
      if (k < 0.0) 1 else 0)
    val got = SparkEntry.queries("q554_gev_lmoments")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).head
    assert(got == expected, s"got $got expected $expected")
    // L-scale is positive for any non-degenerate sample
    assert(got._3 > 0.0)
  }

  // ---------------------------------------------------------------- q555

  test("q555 Engle-Granger equals the two-stage fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val series = (mn to mx).map { d =>
      (cnt.getOrElse(("click", d), 0L), cnt.getOrElse(("view", d), 0L))
    }
    val n = series.length.toLong
    val sx = series.map(_._2).sum
    val sy = series.map(_._1).sum
    val sxy = series.map(p => p._2 * p._1).sum
    val sxx = series.map(p => p._2 * p._2).sum
    val beta = (sxy.toDouble - sx.toDouble * sy / n) / (sxx.toDouble - sx.toDouble * sx / n)
    val icpt = sy.toDouble / n - beta * sx / n
    val es = series.map { case (y, x) => y.toDouble - (beta * x + icpt) }
    val pairs = es.sliding(2).map { case Seq(ep, e) => (ep, e) }.toSeq
    val sed = pairs.map { case (ep, e) => qiL(ep * (e - ep)) }.sum
    val see = pairs.map { case (ep, _) => qiL(ep * ep) }.sum
    val ph = sed.toDouble / see
    val t = pairs.length.toLong
    val sq = pairs.map { case (ep, e) =>
      qiL((e - ep - ph * ep) * (e - ep - ph * ep))
    }.sum
    val adf = ph / math.sqrt((sq.toDouble / 1048576.0 / (t - 1)) / (see.toDouble / 1048576.0))
    val expected = (n, snapD(beta), snapD(ph), snapD(adf),
      if (adf < -3.34) 1 else 0)
    val got = SparkEntry.queries("q555_engle_granger")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    // the DF coefficient pulls residuals back (phi < 0) on any mean-reverting series
    assert(got._3 < 0.5)
  }

  // ---------------------------------------------------------------- q556

  test("q556 KM RMST equals the sequential curve walk") {
    val u = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, xs) =>
        (xs.map(_._2).min, xs.map(_._2).max)
      }.toSeq
    val gm = u.map(_._2).max
    val lt = u.map { case (f, l) =>
      (Math.floorDiv(l - f, 86400000000L), if (2L * (gm - l) < 86400000000L) 0 else 1)
    }
    val n = lt.length.toLong
    val nd = lt.map(_._2.toLong).sum
    val deaths = lt.filter(_._2 == 1).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, xs) => (t, xs.length.toLong) }
    val expected = Seq(27L, 30L).map { tau =>
      var cl = 0L
      var prevT = 0L
      var s = 1.0
      var rmst = 0.0
      var sAtTau = 1.0
      val firstDeath = deaths.headOption.map(_._1).getOrElse(tau)
      rmst += math.min(firstDeath, tau).toDouble
      deaths.zipWithIndex.foreach { case ((t, d), i) =>
        val r = lt.count(_._1 >= t).toLong
        cl += qiL(math.log(1.0 - d.toDouble / r))
        val sHere = math.exp(cl.toDouble / 1048576.0)
        if (t < tau) sAtTau = sHere
        val nxt = deaths.lift(i + 1).map(_._1).getOrElse(tau)
        if (t < tau)
          rmst += sHere * (math.min(nxt, tau) - t)
        prevT = t
        s = sHere
      }
      (tau, n, nd, snapD(rmst), snapD(sAtTau))
    }
    val got = SparkEntry.queries("q556_km_rmst")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // RMST grows with tau and never exceeds it
    assert(got(0)._4 <= got(1)._4 && got.forall(r => r._4 <= r._1))
  }

  test("q556 KM S(tau) on synthetic data with multiple death times") {
    // Six distinct death times below tau plus two end-of-window censored
    // users: S(tau) must read the cumulative log-survival at the LAST
    // death before tau (min of the negative cumsum), not the first. The
    // closed form here is (7/8)(6/7)(5/6)(4/5)(3/4)(2/3) = 1/4; a
    // first-death regression would return 7/8 instead.
    import spark.implicits._
    val day = 86400000000L
    val lifetimes = Seq(1L, 2L, 3L, 5L, 10L, 20L, 25L, 25L)
    val rows = lifetimes.zipWithIndex.flatMap { case (lt, u) =>
      Seq((u.toLong * 2, 0L, u.toLong, "view", 1.0, "{}"),
        (u.toLong * 2 + 1, lt * day, u.toLong, "view", 1.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-q556-").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q556_km_rmst")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toList
    assert(got.map(_._2) == List(6L, 6L), s"expected 6 deaths, got $got")
    got.foreach { case (tau, _, sAtTau) =>
      assert(math.abs(sAtTau - 0.25) < 1e-4,
        s"S($tau) = $sAtTau, expected ~0.25 (last-death semantics)")
    }
  }

  // ---------------------------------------------------------------- q557

  test("q557 CRPS equals the direct ensemble fold") {
    val ys = dailyOrderCounts
    val tests = 28 until ys.length
    val crpsQ = tests.map { t =>
      val ens = (1 to 28).map(o => ys(t - o))
      val sad = ens.map(e => math.abs(e - ys(t))).sum
      val spd = (for (i <- ens.indices; j <- (i + 1) until ens.length)
        yield math.abs(ens(i) - ens(j))).sum
      qiL(sad.toDouble / 28 - spd.toDouble / (28 * 28))
    }.sum
    val nt = tests.length.toLong
    val mae = tests.map(t => math.abs(ys(t) - ys(t - 1))).sum
    val meanCrps = crpsQ.toDouble / 1048576.0 / nt
    val naiveMae = mae.toDouble / nt
    val expected = (nt, snapD(meanCrps), snapD(naiveMae),
      snapD(1.0 - meanCrps / naiveMae))
    val got = SparkEntry.queries("q557_crps")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).head
    assert(got == expected, s"got $got expected $expected")
    // a calibrated ensemble should beat the naive point forecast
    assert(got._2 <= got._3 + 1e-9)
  }

  // ---------------------------------------------------------------- q558

  test("q558 Erlang-B equals the sequential recursion and the closed form") {
    val ts = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect().map(_.getLong(0))
    val a = ts.length.toDouble / ((ts.max.toDouble - ts.min) / 1000000) * 0.65 * 1000
    var b = 1.0
    val curve = (1 to 32).map { k =>
      b = a * b / (k + a * b)
      (k.toLong, b)
    }
    val firstOk = curve.find(_._2 < 0.01).map(_._1).getOrElse(-1L)
    val expected = Seq(1, 2, 4, 8, 16, 32).map { m =>
      (m.toLong, snapD(a), snapD(curve(m - 1)._2), firstOk)
    }
    val got = SparkEntry.queries("q558_erlang_b_curve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // INDEPENDENT check: the B_k = t_k/Σt_j closed form agrees
    val tks = (0 to 32).scanLeft(1.0) { case (t, k) => if (k == 0) t else t * a / k }
      .tail // t_0..t_32 via stable ratios
    Seq(1, 2, 4, 8, 16, 32).foreach { k =>
      val closed = tks(k) / tks.take(k + 1).sum
      val cell = got.find(_._1 == k).get._3
      assert(math.abs(cell - closed) < 1e-9, s"m=$k $cell vs closed $closed")
    }
    // blocking is monotone decreasing in servers
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  // ---------------------------------------------------------------- q559

  test("q559 eta ladder equals the group-mean fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us", "value").collect()
      .map { r =>
        val us = r.getLong(1)
        (r.getString(0), Math.floorDiv(us, 86400000000L) % 7,
          Math.floorDiv(us, 3600000000L) % 24, r.getDouble(2) / 100.0)
      }
    val n = ev.length.toLong
    val s1 = ev.map(e => qiL(e._4)).sum
    val s2 = ev.map(e => qiL(e._4 * e._4)).sum
    val sst = s2.toDouble / 1048576.0 -
      (s1.toDouble / 1048576.0) * (s1.toDouble / 1048576.0) / n
    def rung(key: ((String, Long, Long, Double)) => Any): (Long, Double) = {
      val gs = ev.groupBy(key).values.map { g =>
        val sq = g.map(e => qiL(e._4)).sum
        qiL((sq.toDouble / 1048576.0) * (sq.toDouble / 1048576.0) / g.length)
      }.toSeq
      (gs.length.toLong,
        (gs.sum.toDouble / 1048576.0 -
          (s1.toDouble / 1048576.0) * (s1.toDouble / 1048576.0) / n) / sst)
    }
    val r1 = rung(e => e._1)
    val r2 = rung(e => (e._1, e._2))
    val r3 = rung(e => (e._1, e._2, e._3))
    val expected = Seq(
      (1L, "type", r1._1, snapD(r1._2), snapD(r1._2 - 0.0)),
      (2L, "type_x_dow", r2._1, snapD(r2._2), snapD(r2._2 - r1._2)),
      (3L, "type_x_dow_x_hour", r3._1, snapD(r3._2), snapD(r3._2 - r2._2)))
    val got = SparkEntry.queries("q559_eta_ladder")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // finer groupings never explain less
    assert(got.map(_._4) == got.map(_._4).sorted)
  }
}
