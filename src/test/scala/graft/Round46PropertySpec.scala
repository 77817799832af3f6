package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-46 differential sweeps. q547's reference walks each trial
  * sequentially (observe 23, take the first improvement, else the
  * last) — independent of the query's join algebra; the others are
  * full driver folds of the stated formulas.
  */
class Round46PropertySpec extends AnyFunSuite {

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

  private def hourlyCounts: IndexedSeq[Long] = {
    val hs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 3600000000L))
    val cnt = hs.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    (hs.min to hs.max).map(h => cnt.getOrElse(h, 0L))
  }

  private def dailyOrderCounts: IndexedSeq[Long] = {
    val ds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
  }

  // ---------------------------------------------------------------- q542

  test("q542 Hurst R/S equals the block fold") {
    val xs = hourlyCounts
    def meanLnRs(m: Int): (Long, Double) = {
      val lrs = xs.grouped(m).filter(_.length == m).flatMap { blk =>
        val sx = blk.sum
        val sxx = blk.map(x => x * x).sum
        var p = 0L
        val zs = blk.zipWithIndex.map { case (x, i) =>
          p += m * x
          p - (i + 1L) * sx
        }
        val rng = zs.max - math.min(0L, zs.min)
        if (m * sxx - sx * sx > 0 && rng > 0)
          Some(math.log((rng.toDouble / m) /
            math.sqrt((m.toDouble * sxx - sx.toDouble * sx) / (m.toDouble * m))))
        else None
      }.toSeq
      (lrs.length.toLong, lrs.map(qiL).sum.toDouble / 1048576.0 / lrs.length)
    }
    val per = Seq(32, 64, 128).map(m => (m.toLong, meanLnRs(m)))
    val hurst = (per(2)._2._2 - per(0)._2._2) / (2.0 * math.log(2.0))
    val expected = per.map { case (m, (nb, y)) => (m, nb, snapD(y), snapD(hurst)) }
    val got = SparkEntry.queries("q542_hurst_rs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // a sane Hurst estimate for a count series
    assert(got.head._4 > 0.0 && got.head._4 < 1.2)
  }

  // ---------------------------------------------------------------- q543

  test("q543 newsvendor equals the distribution fold") {
    val ds = dailyOrderCounts
    val n = ds.length.toLong
    val sorted = ds.sorted
    val expected = Seq(50L, 80L, 95L).map { sl =>
      val s = sorted(((sl * n + 99) / 100 - 1).toInt)
      val under = ds.filter(_ > s).map(_ - s).sum
      val over = ds.filter(_ < s).map(s - _).sum
      val fill = ds.count(_ <= s).toLong
      (sl, s, snapD(under.toDouble / n), snapD(over.toDouble / n),
        snapD(fill.toDouble / n))
    }
    val got = SparkEntry.queries("q543_newsvendor")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // higher service level, higher stock, lower underage
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  // ---------------------------------------------------------------- q544

  test("q544 price indices equal the part-year fold") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(year(l_shipdate) AS BIGINT) AS y", "l_partkey",
        "CAST(round(CAST(l_extendedprice AS DOUBLE) / l_quantity * CAST(100 AS DOUBLE)) AS BIGINT) AS uc",
        "CAST(l_quantity AS DOUBLE) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val py = li.groupBy(r => (r._1, r._2)).map { case ((y, pk), xs) =>
      (y, pk, xs.map(x => x._3 * qiL(x._4)).sum, xs.map(x => qiL(x._4)).sum)
    }.toSeq
    val y0 = py.map(_._1).min
    val base = py.filter(_._1 == y0).map(r => r._2 -> (r._3, r._4)).toMap
    val expected = py.map(_._1).filter(_ > y0).distinct.sorted.map { y =>
      val pairs = py.filter(r => r._1 == y && base.contains(r._2)).map { r =>
        val (bn, bd) = base(r._2)
        (r._3.toDouble / r._4, bn.toDouble / bd, bd, r._4)
      }
      def s(f: ((Double, Double, Long, Long)) => Double): Long =
        pairs.map(p => qiL(f(p))).sum
      val ptq0 = s(p => p._1 * p._3 / 1048576.0 / 100)
      val p0q0 = s(p => p._2 * p._3 / 1048576.0 / 100)
      val ptqt = s(p => p._1 * p._4 / 1048576.0 / 100)
      val p0qt = s(p => p._2 * p._4 / 1048576.0 / 100)
      val l = ptq0.toDouble / p0q0
      val pa = ptqt.toDouble / p0qt
      (y, pairs.length.toLong, snapD(l), snapD(pa), snapD(math.sqrt(l * pa)))
    }
    val got = SparkEntry.queries("q544_price_index")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q545

  test("q545 Tukey HSD equals the pooled-variance pair replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1) / 100.0))
    val per = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val zs = xs.map(_._2)
      val n = zs.length.toLong
      val s1 = zs.map(qiL).sum
      val s2 = zs.map(z => qiL(z * z)).sum
      val m = s1.toDouble / 1048576.0 / n
      val v = (s2.toDouble / 1048576.0 -
        (s1.toDouble / 1048576.0 / n) * (s1.toDouble / 1048576.0 / n) * n) / (n - 1)
      (t, n, m, v)
    }
    val nt = per.map(_._2).sum
    val k = per.length.toLong
    val swv = per.map { case (_, n, _, v) => qiL((n - 1) * v) }.sum
    val sp2 = swv.toDouble / 1048576.0 / (nt - k)
    val expected = for {
      i <- per.indices; j <- (i + 1) until per.length
    } yield {
      val (ta, na, ma, _) = per(i)
      val (tb, nb, mb, _) = per(j)
      val se = math.sqrt(sp2 / 2 * (1.0 / na + 1.0 / nb))
      val q = math.abs(ma - mb) / se
      (ta, tb, snapD((ma - mb) * 100.0), snapD(se * 100.0), snapD(q),
        if (q > 3.858) 1 else 0)
    }
    val got = SparkEntry.queries("q545_tukey_hsd")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == expected.toSeq, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q546

  test("q546 Dirichlet LM equals the score fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) =>
      (id, t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    }
    val cw = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val tt = cw.values.sum
    val terms = cw.toSeq.sortBy { case (w, c) => (-c, w) }.take(3)
    val expected = Seq(100L, 1000L).flatMap { mu =>
      val scored = toks.filter(_._2.nonEmpty).map { case (id, ws) =>
        val len = ws.length.toLong
        val sq = terms.map { case (w, c) =>
          val tf = ws.count(_ == w).toLong
          qiL(math.log((tf.toDouble + mu * (c.toDouble / tt)) / (len + mu)))
        }.sum
        (id, sq)
      }
      scored.sortBy { case (id, sq) => (-sq, id) }.take(10).zipWithIndex.map {
        case ((id, sq), i) => (mu, i + 1L, id, snapD(sq.toDouble / 1048576.0))
      }
    }
    val got = SparkEntry.queries("q546_dirichlet_lm")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q547

  test("q547 secretary equals the sequential trial walk") {
    val panel = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("CAST(o_orderkey AS BIGINT) AS ok",
        "CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).take(64)
    val mx = panel.map(_._2).max
    val picks = (0L until 50L).map { t =>
      val seq = panel.sortBy { case (ok, _) => (md5i8(s"sec:$t:$ok"), ok) }
      val obsMax = seq.take(23).map(_._2).max
      val pick = seq.drop(23).find(_._2 > obsMax).getOrElse(seq.last)
      pick._2
    }
    val nSucc = picks.count(_ == mx).toLong
    val ranks = picks.map(c => panel.count(_._2 > c).toLong + 1)
    val expected = (50L, nSucc, snapD(nSucc.toDouble / 50),
      snapD(1.0 / math.exp(1.0)), snapD(ranks.sum.toDouble / 50))
    val got = SparkEntry.queries("q547_secretary")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).head
    assert(got == expected, s"got $got expected $expected")
    // the 1/e rule should land in a plausible band around 0.37
    assert(got._3 > 0.15 && got._3 < 0.65)
  }
}
