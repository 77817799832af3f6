package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-56 differential sweeps — driver references for the Page–Hinkley
  * detector, the Hoeffding purchase-share monitor and Taylor's power
  * law. Independent Scala recomputation from collected rows, replicating
  * the SQL's operation order bit-exactly.
  */
class Round56PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def eventUs: Array[Long] =
    graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect().map(_.getLong(0))

  // ---------------------------------------------------------------- q585

  test("q585 Page-Hinkley equals the integer-grid walk") {
    val ds = eventUs.map(Math.floorDiv(_, 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val ys = (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
    var cy = 0L
    var m20 = 0L
    var minM = Long.MaxValue
    val expected = ys.zipWithIndex.map { case (y, t) =>
      cy += y
      m20 += 1048576L * y - qiL(cy.toDouble / (t + 1)) - 524288L
      minM = math.min(minM, m20)
      val ph20 = m20 - minM
      (t.toLong, y, snapD(m20.toDouble / 1048576), snapD(ph20.toDouble / 1048576),
        if (ph20 > 32L * 1048576L) 1 else 0)
    }
    val got = SparkEntry.queries("q585_page_hinkley")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // PH is nonnegative by construction
    assert(got.forall(_._4 >= 0.0))
  }

  // ---------------------------------------------------------------- q586

  test("q586 Hoeffding monitor equals the bound fold") {
    val rows = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "event_type").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L),
        if (r.getString(1) == "purchase") 1L else 0L))
    val byDay = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, xs) => (d, xs.length.toLong, xs.map(_._2).sum) }
    val mn = byDay.map(_._1).min
    val nn = byDay.map(_._2).sum
    val kk = byDay.map(_._3).sum
    val phat = kk.toDouble / nn
    val expected = byDay.map { case (d, n, k) =>
      val share = k.toDouble / n
      val eps = math.sqrt(math.log(40.0) / (2 * n))
      (d - mn, n, k, snapD(share), snapD(phat), snapD(eps),
        if (math.abs(share - phat) > eps) 1 else 0)
    }
    val got = SparkEntry.queries("q586_hoeffding_monitor")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // days with MORE data get a TIGHTER band
    val sorted = got.sortBy(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a._6 >= b._6 - 1e-12 })
  }

  // ---------------------------------------------------------------- q587

  test("q587 Taylor's law equals the quantized-log OLS fold") {
    val rows = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "event_type").collect()
      .map { r =>
        val us = r.getLong(0)
        (r.getString(1), Math.floorDiv(us, 3600000000L) % 24,
          Math.floorDiv(us, 86400000000L))
      }
    val days = rows.map(_._3).min to rows.map(_._3).max
    val cells = rows.map(t => (t._1, t._2)).distinct
    val cnt = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val lg = cells.flatMap { case (et, hh) =>
      val ys = days.map(d => cnt.getOrElse((et, hh, d), 0L))
      val n = ys.length.toLong
      val sy = ys.sum
      val syy = ys.map(y => y * y).sum
      if (sy > 0 && n * syy - sy * sy > 0) {
        val lx = qiL(math.log(sy.toDouble / n))
        val ly = qiL(math.log((syy.toDouble - sy.toDouble * sy / n) / (n - 1)))
        Some((lx, ly))
      } else None
    }
    val n = lg.length.toLong
    val sx = lg.map(_._1).sum
    val sy = lg.map(_._2).sum
    val sxx = lg.map(t => t._1 * t._1).sum
    val sxy = lg.map(t => t._1 * t._2).sum
    val syy = lg.map(t => t._2 * t._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val icept = (sy.toDouble - (n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble * sx) / n / 1048576.0
    val r2 = (n * sxy - sx * sy).toDouble * (n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble / (n * syy - sy * sy).toDouble
    val expected = (n, snapD(slope), snapD(icept), snapD(r2),
      if (slope > 1.5) 1 else 0)
    val got = SparkEntry.queries("q587_taylor_law")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    // r2 is a squared correlation
    assert(got._4 >= -1e-9 && got._4 <= 1.0 + 1e-9)
  }
}
