package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-60 differential sweeps — driver references for Cohen's d /
  * Hedges' g, Cliff's delta / A12 and the trimmed/winsorized means.
  * Independent Scala recomputation from collected rows, replicating the
  * SQL's operation order bit-exactly.
  */
class Round60PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def arms: (Array[Double], Array[Double]) = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    (ev.filter(_._1 == "click").map(_._2), ev.filter(_._1 == "view").map(_._2))
  }

  // ---------------------------------------------------------------- q596

  test("q596 Cohen's d / Hedges' g equals the pooled-moment fold") {
    val (xs, ys) = arms
    val na = xs.length.toLong; val nb = ys.length.toLong
    val sa = xs.map(qiL).sum; val sb = ys.map(qiL).sum
    val qa = xs.map(v => qiL(v * v)).sum; val qb = ys.map(v => qiL(v * v)).sum
    val delta = sa.toDouble / 1048576.0 / na - sb.toDouble / 1048576.0 / nb
    val s2p = ((qa.toDouble / 1048576.0 -
      (sa.toDouble / 1048576.0) * (sa.toDouble / 1048576.0) / na) +
      (qb.toDouble / 1048576.0 -
        (sb.toDouble / 1048576.0) * (sb.toDouble / 1048576.0) / nb)) / (na + nb - 2)
    val d = delta / math.sqrt(s2p)
    val g = (1 - 3.0 / (4 * (na + nb) - 9)) * d
    val mag = if (math.abs(d) < 0.2) "negligible" else if (math.abs(d) < 0.5) "small"
      else if (math.abs(d) < 0.8) "medium" else "large"
    val expected = (na, nb, snapD(delta), snapD(math.sqrt(s2p)), snapD(d),
      snapD(g), mag)
    val got = SparkEntry.queries("q596_cohens_d")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getString(6))).head
    assert(got == expected, s"got $got expected $expected")
    // Hedges' correction shrinks toward zero
    assert(math.abs(got._6) <= math.abs(got._5) + 1e-12)
  }

  // ---------------------------------------------------------------- q597

  test("q597 Cliff's delta equals the brute-force pair count") {
    val (xs, ys) = arms
    val xc = xs.map(v => math.round(v * 100))
    val yc = ys.map(v => math.round(v * 100))
    // brute force O(n^2) on the sf0.001 fixture — deliberately a DIFFERENT
    // algorithm from the SQL's histogram sweep
    var gt = 0L; var lt = 0L; var ties = 0L
    for (x <- xc; y <- yc) {
      if (x > y) gt += 1 else if (x < y) lt += 1 else ties += 1
    }
    val n1 = xc.length.toLong; val n2 = yc.length.toLong
    val cd = (gt - lt).toDouble / (n1 * n2)
    val a12 = (gt + ties.toDouble / 2) / (n1 * n2)
    val mag = if (math.abs(cd) < 0.147) "negligible" else if (math.abs(cd) < 0.33)
      "small" else if (math.abs(cd) < 0.474) "medium" else "large"
    val expected = (n1, n2, gt, lt, ties, 1, snapD(cd), snapD(a12), mag)
    val got = SparkEntry.queries("q597_cliffs_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getDouble(6),
        r.getDouble(7), r.getString(8))).head
    assert(got == expected, s"got $got expected $expected")
    // A12 and delta are the same information: A12 = (delta+1)/2 up to ties
    assert(math.abs(got._8 - (got._7 + 1) / 2) < 1e-9)
  }

  // ---------------------------------------------------------------- q598

  test("q598 trimmed/winsorized means equal the order-statistic fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._2)).map(_._3)
      val n = sorted.length.toLong
      val k = (n / 10).toInt
      val mid = sorted.slice(k, sorted.length - k)
      val lo = sorted(k); val hi = sorted(sorted.length - k - 1)
      (t, n, k.toLong,
        snapD(sorted.sum.toDouble / n / 100),
        snapD(mid.sum.toDouble / (n - 2 * k) / 100),
        snapD((mid.sum + k * lo + k * hi).toDouble / n / 100))
    }
    val got = SparkEntry.queries("q598_trimmed_winsorized")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // winsorized sits between trimmed and raw mean direction-wise sane:
    // all three are finite and trimming never empties the body
    got.foreach(r => assert(r._2 - 2 * r._3 > 0))
  }
}
