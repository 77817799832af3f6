package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-53 differential sweeps — driver references for the pinball-grid
  * quantile regression, Jain's index, Atkinson index and the
  * Cameron–Trivedi overdispersion regression. Independent Scala
  * recomputation from collected rows.
  */
class Round53PropertySpec extends AnyFunSuite {

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

  // ---------------------------------------------------------------- q575

  test("q575 quantile regression equals the grid-search fold") {
    val ys = dailyOrderCounts
    val n = ys.length.toLong
    val sx = ys.indices.map(_.toLong).sum
    val sy = ys.sum
    val sxy = ys.zipWithIndex.map { case (y, x) => x.toLong * y }.sum
    val sxx = ys.indices.map(i => i.toLong * i).sum
    val bq = qiL((sxy.toDouble - sx.toDouble * sy / n) / (sxx.toDouble - sx.toDouble * sx / n))
    val span = 4L * math.abs(bq) + 2097152L
    val slopes = (0L to 64L).map(gi => -(2 * math.abs(bq) + 1048576L) +
      Math.floorDiv(gi * span, 64L))
    val expected = Seq(10L, 18L).map { t20 =>
      val cands = slopes.map { b =>
        val rs = ys.zipWithIndex.map { case (y, x) => 1048576L * y - b * x }
        val sorted = rs.sorted
        val a = sorted((math.ceil(t20.toDouble * n / 20) - 1).toInt)
        val pl = rs.map { r =>
          if (r >= a) t20 * (r - a) else (t20 - 20) * (r - a)
        }.sum
        (pl, b, a)
      }
      val (pl, b, a) = cands.minBy { case (p, b, _) => (p, b) }
      (snapD(t20.toDouble / 20), snapD(b.toDouble / 1048576.0),
        snapD(a.toDouble / 1048576.0), snapD(pl.toDouble / 1048576.0 / 20))
    }
    val got = SparkEntry.queries("q575_quantile_regression")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the tau=0.9 line never sits below the median line at the data centroid
    assert(got(1)._3 + got(1)._2 * (n / 2) >= got(0)._3 + got(0)._2 * (n / 2) - 1e-6)
  }

  // ---------------------------------------------------------------- q576

  test("q576 Jain fairness equals the driver moments") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def jain(xs: Seq[Long]): (Long, Double, Double) = {
      val nU = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      (nU, snapD(sx.toDouble * sx / (nU.toDouble * sxx)), snapD(1.0 / nU))
    }
    val perType = ev.groupBy(_._1).toSeq.map { case (t, xs) =>
      val counts = xs.groupBy(_._2).values.map(_.length.toLong).toSeq
      val (nU, j, w) = jain(counts)
      (t, nU, j, w)
    }
    val allCounts = ev.groupBy(_._2).values.map(_.length.toLong).toSeq
    val (nA, jA, wA) = jain(allCounts)
    val expected = (perType :+ (("ALL", nA, jA, wA))).sortBy(_._1)
    val got = SparkEntry.queries("q576_jain_fairness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    got.foreach(r => assert(r._3 >= r._4 - 1e-9 && r._3 <= 1.0 + 1e-9))
  }

  // ---------------------------------------------------------------- q577

  test("q577 Atkinson equals the driver fold") {
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }.toSeq
      .filter(_ > 0)
    val n = cents.length.toLong
    val sc = cents.sum
    val sl = cents.map(c => qiL(math.log(c.toDouble * n / sc))).sum
    val ss = cents.map(c => qiL(math.sqrt(c.toDouble * n / sc))).sum
    val expected = (n,
      snapD(1.0 - math.exp(sl.toDouble / 1048576.0 / n)),
      snapD(1.0 - (ss.toDouble / 1048576.0 / n) * (ss.toDouble / 1048576.0 / n)))
    val got = SparkEntry.queries("q577_atkinson")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).head
    assert(got == expected, s"got $got expected $expected")
    // more aversion => more measured inequality; both in [0, 1)
    assert(got._2 >= got._3 - 1e-9 && got._2 >= 0.0 && got._2 < 1.0)
  }

  // ---------------------------------------------------------------- q578

  test("q578 overdispersion equals the auxiliary-regression fold") {
    val hs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map { r =>
        val us = r.getLong(0)
        val hh = Math.floorDiv(us, 3600000000L)
        val dow = (Math.floorDiv(us, 86400000000L) + 4) % 7
        (dow, hh % 24, hh)
      }
    val perHour = hs.groupBy(h => h._3).toSeq.map { case (_, xs) =>
      val h = xs.head
      ((h._1, h._2), xs.length.toLong)
    }
    val cls = perHour.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val terms = perHour.map { case (k, y) =>
      val (m, sy) = cls(k)
      val mu = sy.toDouble / m
      val z = (y - mu) * (y - mu) - y
      (qiL(z * mu), qiL(mu * mu), qiL(z * z))
    }
    val n = terms.length.toLong
    val szm = terms.map(_._1).sum
    val smm = terms.map(_._2).sum
    val szz = terms.map(_._3).sum
    val alpha = szm.toDouble / smm
    val s2 = (szz.toDouble / 1048576.0 - alpha * (szm.toDouble / 1048576.0)) / (n - 1)
    val t = alpha * math.sqrt(smm.toDouble / 1048576.0) / math.sqrt(s2)
    val expected = (n, snapD(alpha), snapD(t), if (t > 1.645) 1 else 0)
    val got = SparkEntry.queries("q578_overdispersion")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3))).head
    assert(got == expected, s"got $got expected $expected")
  }
}
