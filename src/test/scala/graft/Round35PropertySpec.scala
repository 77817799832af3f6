package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-35 differential sweeps — independent driver references for the
  * DTW distance and the deterministic RANSAC fit (both engine paths
  * involve generated SQL / driver DP; these re-derive everything from
  * the raw collected events).
  */
class Round35PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private lazy val events = graft.sources.Tables.events(spark, sfDir)
    .selectExpr("CAST(ts AS DATE) AS day", "event_type")
    .collect().map(r => (r.getDate(0).toString, r.getString(1)))

  test("q492 DTW equals an independent driver DP over daily shares") {
    def curve(tp: String): Seq[Double] = {
      val byDay = events.filter(_._2 == tp).groupBy(_._1)
        .map { case (d, xs) => d -> xs.length.toLong }.toSeq.sortBy(_._1)
      val tot = byDay.map(_._2).sum
      byDay.map(x => snapD(x._2.toDouble / tot))
    }
    val a = curve("click"); val b = curve("purchase")
    val n = a.length; val m = b.length
    val inf = Long.MaxValue / 4
    val d = Array.fill(n + 1, m + 1)(inf)
    d(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = qiL(math.abs(a(i - 1) - b(j - 1))) +
        math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
    val lock = (0 until math.min(n, m)).map(i => qiL(math.abs(a(i) - b(i)))).sum
    val r = SparkEntry.queries("q492_dtw")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n.toLong && r.getLong(1) == m.toLong)
    assert(r.getDouble(2) == snapD(d(n)(m).toDouble / 1048576.0 / (n + m)))
    assert(r.getDouble(3) == snapD(lock.toDouble / 1048576.0 / math.min(n, m)))
    // warping can only help: DTW per-step cost never exceeds lockstep
    assert(r.getDouble(2) <= r.getDouble(3) + 1e-12)
  }

  test("q493 RANSAC equals an independent driver trial replay") {
    val byDay = events.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
      .toSeq.sortBy(_._1)
    val pts = byDay.zipWithIndex.map { case ((_, c), i) => (i + 1L, c.toDouble) }
    val n = pts.length.toLong
    val mu = snapD(pts.map(_._2).sum / n)
    def md5mod(seed: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      v % n
    }
    val ptsMap = pts.toMap
    val scored = (1L to 50L).flatMap { t =>
      val ia = 1 + md5mod(s"$t:a")
      val ib = 1 + md5mod(s"$t:b")
      if (ia == ib) None
      else {
        val (xa, ya) = (ia.toDouble, ptsMap(ia))
        val (xb, yb) = (ib.toDouble, ptsMap(ib))
        val rawSlope = (yb - ya) / (xb - xa)
        val slope = snapD(rawSlope)
        val icept = snapD(ya - rawSlope * xa)
        val inliers = pts.count { case (x, y) =>
          math.abs(y - (icept + slope * x)) <= 0.1 * mu
        }.toLong
        Some((t, slope, icept, inliers))
      }
    }
    val best = scored.minBy(s => (-s._4, s._1))
    val r = SparkEntry.queries("q493_ransac_line")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == best._1, s"trial ${r.getLong(0)} != ${best._1}")
    assert(r.getLong(1) == best._4)
    assert(r.getDouble(2) == best._2)
    assert(r.getDouble(3) == best._3)
    assert(r.getDouble(4) == snapD(best._4.toDouble / n))
  }
}
