package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-61 differential sweeps — driver references for the Kuiper
  * test, circular mean / Rayleigh and the Markov entropy rate.
  * Independent Scala recomputation from collected rows, replicating the
  * SQL's operation order bit-exactly.
  */
class Round61PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q599

  test("q599 Kuiper equals the integer CDF fold") {
    val hs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 3600000000L) % 24).toInt)
    val c = Array.fill(24)(0L)
    hs.foreach(h => c(h) += 1)
    val n = hs.length.toLong
    val cum = c.scanLeft(0L)(_ + _).tail
    val dp = (0 until 24).map(k => 24 * cum(k) - (k + 1) * n).max
    val dm = (0 until 24).map(k => (k + 1) * n - 24 * cum(k)).max
    val expected = (n, dp, dm, snapD(dp.toDouble / (24 * n)),
      snapD(dm.toDouble / (24 * n)), snapD((dp + dm).toDouble / (24 * n)))
    val got = SparkEntry.queries("q599_kuiper")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // V is rotation-invariant: rotating the bins by any offset leaves it fixed
    val vRot = (0 until 24).map { off =>
      val cr = (0 until 24).map(k => c((k + off) % 24).toLong)
      val cumr = cr.scanLeft(0L)(_ + _).tail
      val dpr = (0 until 24).map(k => 24 * cumr(k) - (k + 1) * n).max
      val dmr = (0 until 24).map(k => (k + 1) * n - 24 * cumr(k)).max
      dpr + dmr
    }
    assert(vRot.distinct.size == 1 && vRot.head == dp + dm)
  }

  // ---------------------------------------------------------------- q600

  test("q600 circular mean equals the quantized trig fold") {
    val usd = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => r.getLong(0) % 86400000000L)
    val thetas = usd.map(u => 2 * math.Pi * u / 8.64e10)
    val n = thetas.length.toLong
    val c20 = thetas.map(t => qiL(math.cos(t))).sum
    val s20 = thetas.map(t => qiL(math.sin(t))).sum
    val cb = c20.toDouble / 1048576.0 / n
    val sb = s20.toDouble / 1048576.0 / n
    val rbar = math.sqrt(cb * cb + sb * sb)
    val mh0 = math.atan2(sb, cb) / (2 * math.Pi) * 24
    val mh = if (mh0 < 0) mh0 + 24 else mh0
    val z = n * rbar * rbar
    val expected = (n, snapD(mh), snapD(rbar), snapD(z),
      if (z > 2.995732273553991) 1 else 0)
    val got = SparkEntry.queries("q600_circular_mean")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._3 >= 0.0 && got._3 <= 1.0 + 1e-9 && got._2 >= 0.0 && got._2 < 24.0)
  }

  // ---------------------------------------------------------------- q601

  test("q601 Markov entropy equals the transition fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }
    val nab = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val na = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nb = trans.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = trans.size.toLong
    val h20 = nab.map { case ((a, _), c) =>
      qiL((c.toDouble / n) * math.log(c.toDouble / na(a)))
    }.sum
    val h020 = nb.values.map(c => qiL((c.toDouble / n) * math.log(c.toDouble / n))).sum
    val expected = (n, snapD(-h20.toDouble / 1048576.0),
      snapD(-h020.toDouble / 1048576.0), snapD(1 - h20.toDouble / h020.toDouble))
    val got = SparkEntry.queries("q601_markov_entropy")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).head
    assert(got == expected, s"got $got expected $expected")
    // conditioning can't add entropy: H_rate <= H_marginal (+ grid slack)
    assert(got._2 <= got._3 + 1e-4)
  }
}
