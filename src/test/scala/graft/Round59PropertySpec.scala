package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-59 differential sweeps — driver references for the Holm
  * step-down and the MDE panel. Independent Scala recomputation from
  * collected rows, replicating the SQL's operation order bit-exactly.
  */
class Round59PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q594

  test("q594 Holm step-down equals the sequential fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = ev.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(e => qiL(e._2)).sum,
        xs.map(e => qiL(e._2 * e._2)).sum)
    }
    val nT = groups.map(_._2).sum
    val svT = groups.map(_._3).sum
    val svvT = groups.map(_._4).sum
    val zs = groups.map { case (t, n, sv, svv) =>
      val rn = nT - n; val rsv = svT - sv; val rsvv = svvT - svv
      val mg = sv.toDouble / 1048576.0 / n
      val mr = rsv.toDouble / 1048576.0 / rn
      val vg = (svv.toDouble / 1048576.0 -
        (sv.toDouble / 1048576.0) * (sv.toDouble / 1048576.0) / n) / (n - 1) / n
      val vr = (rsvv.toDouble / 1048576.0 -
        (rsv.toDouble / 1048576.0) * (rsv.toDouble / 1048576.0) / rn) / (rn - 1) / rn
      (t, n, (mg - mr) / math.sqrt(vg + vr))
    }
    val crit = Seq(2.5758293035489, 2.4977054744123737, 2.3939797998185104,
      2.2414027276049464, 1.9599639845400536)
    val ranked = zs.sortBy { case (t, _, z) => (-math.abs(z), t) }.zipWithIndex
    var alive = 1
    val expected = ranked.map { case ((t, n, z), i) =>
      val pass = if (math.abs(z) > crit(i)) 1 else 0
      alive = math.min(alive, pass)
      (t, n, snapD(z), i + 1, snapD(crit(i)), alive)
    }
    val got = SparkEntry.queries("q594_holm_stepdown")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // rejections are a prefix of the ranking (the step-down property)
    assert(got.map(_._6).sliding(2).forall(p => p.head >= p.last))
  }

  // ---------------------------------------------------------------- q595

  test("q595 MDE panel equals the two-proportion fold") {
    val rows = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "event_type").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L), r.getString(1)))
    val mn = rows.map(_._1).min
    val mx = rows.map(_._1).max
    val half = rows.map { case (d, t) =>
      (t, if (d < mn + (mx - mn + 1) / 2) 1 else 2)
    }
    val n1 = half.count(_._2 == 1).toLong
    val n2 = half.count(_._2 == 2).toLong
    val types = half.map(_._1).distinct.sorted.toSeq
    val expected = types.map { t =>
      val k1 = half.count(h => h._1 == t && h._2 == 1).toLong
      val k2 = half.count(h => h._1 == t && h._2 == 2).toLong
      val pp = (k1 + k2).toDouble / (n1 + n2)
      val shift = k1.toDouble / n1 - k2.toDouble / n2
      val mde = (1.9599639845400536 + 0.8416212335729144) *
        math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
      (t, n1, n2, k1, k2, snapD(pp), snapD(shift), snapD(mde), snapD(mde / pp),
        if (math.abs(shift) > mde) 1 else 0)
    }
    val got = SparkEntry.queries("q595_mde_panel")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getInt(9))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // pooled shares of the five types sum to ~1
    assert(math.abs(got.map(_._6).sum - 1.0) < 1e-6)
  }
}
