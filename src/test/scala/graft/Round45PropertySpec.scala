package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-45 differential sweeps. Two references are deliberately
  * INDEPENDENT implementations, not replays: q538's energy distance is
  * recomputed from raw O(n²) pairwise distances (the query uses
  * cumulative algebra), and q540's working set by literally sliding
  * every window and counting distinct users (the query uses the gap
  * decomposition). A bug in either clever construction cannot hide.
  */
class Round45PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def eventRows =
    graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_id", "event_type", "value", "user_id", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4)))

  private def hourlyCounts: IndexedSeq[Long] = {
    val hs = eventRows.map(r => Math.floorDiv(r._5, 3600000000L))
    val cnt = hs.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    (hs.min to hs.max).map(h => cnt.getOrElse(h, 0L))
  }

  // ---------------------------------------------------------------- q536

  test("q536 robust SE equals the OLS + HC1 replay") {
    val days = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us")
      .collect().map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = days.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val ys = (days.min to days.max).map(d => cnt.getOrElse(d, 0L))
    val n = ys.length.toLong
    val xs = ys.indices.map(_.toLong)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val a = (sxy.toDouble - sx.toDouble * sy / n) / (sxx.toDouble - sx.toDouble * sx / n)
    val sxxc = sxx.toDouble - sx.toDouble * sx / n
    val icpt = sy.toDouble / n - a * sx / n
    val terms = xs.zip(ys).map { case (x, y) =>
      val e = y.toDouble - (a * x + icpt)
      val xt = x.toDouble - sx.toDouble / n
      (qiL(e * e), qiL(xt * xt * e * e))
    }
    val sse = terms.map(_._1).sum
    val sxe = terms.map(_._2).sum
    val seC = math.sqrt((sse.toDouble / 1048576.0 / (n - 2)) / sxxc)
    val seH = math.sqrt(n.toDouble / (n - 2) * (sxe.toDouble / 1048576.0) / (sxxc * sxxc))
    val expected = (n, snapD(a), snapD(seC), snapD(seH), snapD(seH / seC),
      snapD(a / seC), snapD(a / seH))
    val got = SparkEntry.queries("q536_robust_se")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).head
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q537

  test("q537 QQ deciles equal the type-1 quantile replay") {
    val ev = eventRows.filter(r => r._2 == "click" || r._2 == "view")
    def q(t: String, d: Long): Double = {
      val vs = ev.filter(_._2 == t).map(_._3).sorted
      vs(((d * vs.length + 9) / 10 - 1).toInt)
    }
    val expected = (1L to 9L).map { d =>
      val (qa, qb) = (q("click", d), q("view", d))
      (d, snapD(qa), snapD(qb), snapD(qa - qb), snapD(qa / qb))
    }
    val got = SparkEntry.queries("q537_qq_deciles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // quantiles are monotone in the decile
    assert(got.map(_._2) == got.map(_._2).sorted)
  }

  // ---------------------------------------------------------------- q538

  test("q538 energy distance equals the raw O(n^2) pairwise sums") {
    val ev = eventRows.filter(r => r._2 == "click" || r._2 == "view")
      .map(r => (r._2, math.round(r._3 * 100.0)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    def cross(x: Seq[Long], y: Seq[Long]): Long =
      x.map(xi => y.map(yi => math.abs(xi - yi)).sum).sum
    val dxy = cross(a.toSeq, b.toSeq)
    val dxx = cross(a.toSeq, a.toSeq)
    val dyy = cross(b.toSeq, b.toSeq)
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val expected = (na, nb,
      snapD(dxy.toDouble / na / nb / 100),
      snapD(dxx.toDouble / na / na / 100),
      snapD(dyy.toDouble / nb / nb / 100),
      snapD(2.0 * dxy / na / nb / 100 - dxx.toDouble / na / na / 100 - dyy.toDouble / nb / nb / 100))
    val got = SparkEntry.queries("q538_energy_distance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // e-distance is non-negative
    assert(got._6 >= -1e-12)
  }

  // ---------------------------------------------------------------- q539

  test("q539 extremal index equals the sequential declustering replay") {
    val xs = hourlyCounts
    val n = xs.length.toLong
    val sorted = xs.sorted
    val u = sorted(((9 * n + 9) / 10 - 1).toInt)
    val exceed = xs.zipWithIndex.filter(_._1 > u).map(_._2.toLong)
    val expected = Seq(1L, 3L, 6L).map { r =>
      val starts = exceed.zipWithIndex.count { case (idx, i) =>
        i == 0 || idx - exceed(i - 1) > r
      }.toLong
      // max cluster length by walking the runs
      var best = 0L; var cur = 0L
      exceed.zipWithIndex.foreach { case (idx, i) =>
        cur = if (i == 0 || idx - exceed(i - 1) > r) 1L else cur + 1
        best = math.max(best, cur)
      }
      (r, exceed.length.toLong, starts,
        snapD(starts.toDouble / exceed.length), best)
    }
    val got = SparkEntry.queries("q539_extremal_index")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // larger run-gaps merge clusters
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  // ---------------------------------------------------------------- q540

  test("q540 working set equals the literal window simulation") {
    val ev = eventRows.map(r => (r._1, r._4))
    val mn = ev.map(_._1).min
    val mx = ev.map(_._1).max
    val byPos = ev.map { case (p, u) => (p - mn, u) }.toMap
    val t = mx - mn + 1
    val users = ev.map(_._2).distinct.length.toLong
    val expected = Seq(16L, 64L, 256L).map { tau =>
      val nw = t - tau + 1
      val sizes = (0L until nw).map { st =>
        (st until st + tau).flatMap(byPos.get).distinct.length.toLong
      }
      val avg = sizes.sum.toDouble / nw
      (tau, users, nw, snapD(avg), snapD(avg / users))
    }
    val got = SparkEntry.queries("q540_working_set")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // working set grows with the window
    assert(got.map(_._4) == got.map(_._4).sorted)
  }

  // ---------------------------------------------------------------- q541

  test("q541 spectrum flatness equals the residue-class DFT replay") {
    val ev = eventRows.map(r => (r._2, Math.floorDiv(r._5, 3600000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val expected = ev.map(_._1).distinct.sorted.toSeq.map { ty =>
      val series = (mn to mx).map(h => (h % 24, cnt.getOrElse((ty, h), 0L)))
      val n = series.length.toLong
      val sk = series.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      val pw = (1L to 11L).map { f =>
        val sa = sk.map { case (k, s) =>
          qiL(s.toDouble * math.cos(2.0 * math.Pi * f * k / 24.0))
        }.sum
        val sb = sk.map { case (k, s) =>
          qiL(s.toDouble * math.sin(2.0 * math.Pi * f * k / 24.0))
        }.sum
        val p = math.max(1.0 / 1099511627776L,
          (2.0 * sa / 1048576.0 / n) * (2.0 * sa / 1048576.0 / n) +
            (2.0 * sb / 1048576.0 / n) * (2.0 * sb / 1048576.0 / n))
        (f, p)
      }
      val slnp = pw.map { case (_, p) => qiL(math.log(p)) }.sum
      val sp = pw.map { case (_, p) => qiL(p * 1024) }.sum
      val (pf, pp) = pw.minBy { case (f, p) => (-p, f) }
      (ty, n, pf, snapD(24.0 / pf), snapD(pp),
        snapD(pp * 11 / (sp.toDouble / 1024 / 1048576.0 * 11)),
        snapD(math.exp(slnp.toDouble / 1048576.0 / 11) / (sp.toDouble / 1024 / 1048576.0 / 11)))
    }
    val got = SparkEntry.queries("q541_spectrum_flatness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // flatness lives in (0, 1]
    assert(got.forall(r => r._7 > 0.0 && r._7 <= 1.0 + 1e-9))
  }
}
