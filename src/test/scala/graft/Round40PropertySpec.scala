package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-40 differential sweeps — driver references for the broken-stick
  * fit, decay-ESS, span-corruption audit, Jarque–Bera, Group-DRO
  * weights, and the session-gap sweep. Same rationale as Round39: both
  * engines replay one generated SQL text, so only an independent Scala
  * fold catches a bug baked into the text itself.
  */
class Round40PropertySpec extends AnyFunSuite {

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

  // ---------------------------------------------------------------- q507

  test("q507 broken stick equals the prefix-moment replay") {
    val days = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us")
      .collect().map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val mn = days.min
    val mx = days.max
    val byDay = days.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val ys = (mn to mx).map(d => byDay.getOrElse(d, 0L)).toArray
    val n = ys.length.toLong
    def cxx(sxx: Long, sx: Long, nn: Long): Double =
      sxx.toDouble - sx.toDouble * sx / nn
    def cxy(sxy: Long, sx: Long, sy: Long, nn: Long): Double =
      sxy.toDouble - sx.toDouble * sy / nn
    def sse(syy: Long, sy: Long, sxy: Long, sx: Long, sxx: Long, nn: Long): Double =
      cxx(syy, sy, nn) - cxy(sxy, sx, sy, nn) * cxy(sxy, sx, sy, nn) / cxx(sxx, sx, nn)
    val xs = ys.indices.map(_.toLong)
    val (tx, ty) = (xs.sum, ys.sum)
    val txy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val txx = xs.map(x => x * x).sum
    val tyy = ys.map(y => y * y).sum
    var (px, py, pxy, pxx, pyy) = (0L, 0L, 0L, 0L, 0L)
    val cands = xs.map { x =>
      val y = ys(x.toInt)
      px += x; py += y; pxy += x * y; pxx += x * x; pyy += y * y
      val nl = x + 1
      val nr = n - x - 1
      if (x >= 1 && x <= n - 3) {
        val sse2 = sse(pyy, py, pxy, px, pxx, nl) +
          sse(tyy - pyy, ty - py, txy - pxy, tx - px, txx - pxx, nr)
        val sl = cxy(pxy, px, py, nl) / cxx(pxx, px, nl)
        val sr = cxy(txy - pxy, tx - px, ty - py, nr) / cxx(txx - pxx, tx - px, nr)
        Some((x, sse2, sl, sr))
      } else None
    }.flatten
    val best = cands.minBy { case (x, s2, _, _) => (s2, x) }
    val sse1 = sse(tyy, ty, txy, tx, txx, n)
    val expected = (n, best._1, mn + best._1, snapD(best._3), snapD(best._4),
      snapD(best._2), snapD(sse1), snapD(1.0 - best._2 / sse1))
    val got = SparkEntry.queries("q507_broken_stick")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).head
    assert(got == expected, s"got $got expected $expected")
    // two segments never fit worse than one line
    assert(got._6 <= got._7 + 1e-9)
  }

  // ---------------------------------------------------------------- q508

  test("q508 decay ESS equals the per-day weight fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L)))
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }
    val expected = cnt.map(_._1).toSeq.distinct.sorted.flatMap { t =>
      Seq(5L, 20L, 100L).map { lraw =>
        val lam = lraw.toDouble / 100.0
        val rows = cnt.filter(_._1 == t).map { case (_, d, c) => (c, mx - d) }
        val n = rows.map(_._1).sum
        val sw = rows.map { case (c, a) => qiL(c * math.exp(-lam * a)) }.sum
        val sw2 = rows.map { case (c, a) => qiL(c * math.exp(-2.0 * lam * a)) }.sum
        val swa = rows.map { case (c, a) => qiL(c.toDouble * a * math.exp(-lam * a)) }.sum
        val ess = (sw.toDouble / 1048576.0) * (sw.toDouble / 1048576.0) / (sw2.toDouble / 1048576.0)
        (t, snapD(lam), n, snapD(ess), snapD(ess / n), snapD(swa.toDouble / sw))
      }
    }
    val got = SparkEntry.queries("q508_decay_ess")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // ESS never exceeds N
    assert(got.forall(r => r._4 <= r._3 + 1e-6))
  }

  // ---------------------------------------------------------------- q509

  test("q509 span corruption equals the islands replay") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    case class S(nTok: Long, spans: Seq[Long])
    val per = docs.map { case (src, id, t) =>
      val toks = t.toLowerCase.split("[^a-z]+").zipWithIndex
        .filter(_._1.nonEmpty).map(_._2)
      val marked = toks.filter(p => md5i8(s"span:$id:$p") % 100 < 15)
      // maximal runs of consecutive positions
      // runs over RAW positions: a span = marked tokens at consecutive
      // raw pos, matching the SQL's pos - row_number islands
      val spans = marked.foldLeft(List.empty[(Int, Long)]) {
        case ((st, len) :: rest, p) if p == st + len => (st, len + 1) :: rest
        case (acc, p) => (p, 1L) :: acc
      }.map(_._2)
      (src, S(toks.length.toLong, spans))
    }
    val bySrc = per.groupBy(_._1).toSeq.sortBy(_._1)
    val expected = bySrc.map { case (src, xs) =>
      val nTok = xs.map(_._2.nTok).sum
      val allSpans = xs.flatMap(_._2.spans)
      val corrupted = allSpans.sum
      val nSpans = allSpans.length.toLong
      (src, nTok, corrupted, nSpans,
        snapD(corrupted.toDouble / nTok),
        if (nSpans == 0) 0.0 else snapD(corrupted.toDouble / nSpans),
        if (allSpans.isEmpty) 0L else allSpans.max,
        snapD(1000.0 * nSpans / nTok))
    }
    val got = SparkEntry.queries("q509_span_corruption")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // realized corruption share lands near the 15% coin
    assert(got.forall(r => r._5 > 0.05 && r._5 < 0.30))
  }

  // ---------------------------------------------------------------- q510

  test("q510 Jarque-Bera equals the quantized-moment replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val zs = xs.map(_._2 / 100.0)
      val n = zs.length.toLong
      val s1 = zs.map(z => qiL(z)).sum
      val s2 = zs.map(z => qiL(z * z)).sum
      val s3 = zs.map(z => qiL(z * z * z)).sum
      val s4 = zs.map(z => qiL(z * z * z * z)).sum
      val m1 = s1.toDouble / 1048576.0 / n
      val m2 = s2.toDouble / 1048576.0 / n
      val m3 = s3.toDouble / 1048576.0 / n
      val m4 = s4.toDouble / 1048576.0 / n
      val c2 = m2 - m1 * m1
      val c3 = m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1
      val c4 = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1
      val skew = c3 / (c2 * math.sqrt(c2))
      val exk = c4 / (c2 * c2) - 3.0
      val jb = n.toDouble / 6.0 * (skew * skew + exk * exk / 4.0)
      (t, n, snapD(skew), snapD(exk), snapD(jb),
        if (jb > 5.991464547107979) 1 else 0)
    }
    val got = SparkEntry.queries("q510_jarque_bera")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q511

  test("q511 Group-DRO equals the surprisal softmax replay") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (src, t) =>
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(w => (src, w))
    }
    val cw = toks.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val tTot = cw.values.sum
    val perSrc = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val nTok = xs.length.toLong
      val sq = xs.map { case (_, w) => qiL(-math.log(cw(w).toDouble / tTot)) }.sum
      (src, nTok, sq.toDouble / 1048576.0 / nTok)
    }
    val tn = perSrc.map(_._2).sum
    val mxloss = perSrc.map(_._3).max
    val expected = perSrc.flatMap { case (src, nTok, loss) =>
      Seq(1L, 4L).map { eta =>
        val baseShare = nTok.toDouble / tn
        val wq = qiL((nTok.toDouble / tn) * math.exp(eta * (loss - mxloss)))
        (src, eta, loss, baseShare, wq)
      }
    }
    val zq = expected.groupBy(_._2).map { case (e, xs) => e -> xs.map(_._5).sum }
    val expect2 = expected.map { case (src, eta, loss, bs, wq) =>
      (src, eta, snapD(loss), snapD(bs), snapD(wq.toDouble / zq(eta)),
        snapD(wq.toDouble / zq(eta) / bs))
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q511_group_dro")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect2, s"got $got expected $expect2")
    // weights are a distribution per eta
    Seq(1L, 4L).foreach { eta =>
      assert(math.abs(got.filter(_._2 == eta).map(_._5).sum - 1.0) < 1e-4)
    }
  }

  // ---------------------------------------------------------------- q512

  test("q512 session gap sweep equals the per-user lag replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Seq(300L, 900L, 3600L).map { gap =>
      val sessions = ev.groupBy(_._2).values.flatMap { xs =>
        val sorted = xs.sortBy(e => (e._3, e._1))
        val starts = sorted.zipWithIndex.map { case (e, i) =>
          i == 0 || e._3 - sorted(i - 1)._3 > gap * 1000000L
        }
        val sids = starts.scanLeft(0L) { case (acc, st) => acc + (if (st) 1 else 0) }.tail
        sorted.zip(sids).groupBy(_._2).values.map { g =>
          val times = g.map(_._1._3)
          (g.length.toLong, times.max - times.min)
        }
      }.toSeq
      val nS = sessions.length.toLong
      val nE = sessions.map(_._1).sum
      val durSum = sessions.map(_._2).sum
      (gap, nS, nE, snapD(nE.toDouble / nS),
        snapD(durSum.toDouble / nS / 1000000.0),
        snapD(sessions.count(_._1 == 1L).toDouble / nS),
        snapD(sessions.map(_._2).max.toDouble / 1000000.0))
    }
    val got = SparkEntry.queries("q512_session_gap_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // larger gaps merge sessions, never split them
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }
}
