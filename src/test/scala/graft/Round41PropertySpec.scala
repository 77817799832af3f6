package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-41 differential sweeps — driver references for Welch's t,
  * permutation entropy, the whitening audit, range-shard cuts, the
  * diurnal harmonic, and Jonckheere–Terpstra. The q518 reference counts
  * raw ordered pairs O(n²) driver-side — deliberately NOT the query's
  * prefix-sum construction — so a bug in the cumulative-count algebra
  * cannot hide in a shared replay.
  */
class Round41PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def eventRows =
    graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "value", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))

  // ---------------------------------------------------------------- q513

  test("q513 Welch t equals the sufficient-statistics replay") {
    val ev = eventRows.filter(r => r._1 == "click" || r._1 == "view")
    def stats(t: String): (Long, Double, Double) = {
      val vs = ev.filter(_._1 == t).map(_._2)
      val n = vs.length.toLong
      val s1 = vs.map(v => qiL(v)).sum
      val s2 = vs.map(v => qiL(v * v)).sum
      val m = s1.toDouble / 1048576.0 / n
      val vv = (s2.toDouble / 1048576.0 -
        (s1.toDouble / 1048576.0 / n) * (s1.toDouble / 1048576.0 / n) * n) / (n - 1)
      (n, m, vv)
    }
    val (n1, m1, v1) = stats("click")
    val (n2, m2, v2) = stats("view")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    val df = (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    val expected = (n1, n2, snapD(m1), snapD(m2), snapD(t), snapD(df),
      if (math.abs(t) > 1.96) 1 else 0)
    val got = SparkEntry.queries("q513_welch_ttest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6))).head
    assert(got == expected, s"got $got expected $expected")
    // Welch df is bounded by min(n)-1 below and n1+n2-2 above
    assert(got._6 >= math.min(n1, n2) - 1.0 && got._6 <= n1 + n2 - 2.0)
  }

  // ---------------------------------------------------------------- q514

  private def hourlySeries: Map[String, IndexedSeq[Long]] = {
    val ev = eventRows.map(r => (r._1, Math.floorDiv(r._3, 3600000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val types = ev.map(_._1).distinct
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    types.map { t =>
      t -> (mn to mx).map(h => cnt.getOrElse((t, h), 0L))
    }.toMap
  }

  test("q514 permutation entropy equals the ordinal-pattern replay") {
    val expected = hourlySeries.toSeq.sortBy(_._1).map { case (t, xs) =>
      val pats = xs.sliding(3).filter(_.length == 3).map { w =>
        val Seq(x0, x1, x2) = w.toSeq
        val r0 = (if (x1 < x0) 1 else 0) + (if (x2 < x0) 1 else 0)
        val r1 = (if (x0 <= x1) 1 else 0) + (if (x2 < x1) 1 else 0)
        val r2 = (if (x0 <= x2) 1 else 0) + (if (x1 <= x2) 1 else 0)
        r0 * 9 + r1 * 3 + r2
      }.toSeq
      val nt = pats.length.toLong
      val byPat = pats.groupBy(identity).map { case (_, g) => g.length.toLong }
      val hq = byPat.map { c =>
        qiL(-(c.toDouble / nt) * math.log(c.toDouble / nt))
      }.sum
      (t, nt, byPat.size.toLong, snapD(hq.toDouble / 1048576.0),
        snapD(hq.toDouble / 1048576.0 / math.log(6.0)))
    }
    val got = SparkEntry.queries("q514_permutation_entropy")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0 + 1e-9))
  }

  // ---------------------------------------------------------------- q515

  test("q515 whitening audit equals the covariance fold") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val d = vecs.head.length
    val n = vecs.length.toLong
    val mu = (0 until d).map { i =>
      vecs.map(v => qiL(v(i).toDouble)).sum
    }
    def cell(i: Int, j: Int): Double = {
      val sp = vecs.map(v => qiL(v(i).toDouble * v(j).toDouble)).sum
      snapD(sp.toDouble / 1048576.0 / n -
        (mu(i).toDouble / 1048576.0 / n) * (mu(j).toDouble / 1048576.0 / n))
    }
    val cells = for (i <- 0 until d; j <- i until d) yield (i, j, cell(i, j))
    val trq = cells.filter(c => c._1 == c._2).map(c => qiL(c._3)).sum
    val dsq = cells.filter(c => c._1 == c._2).map(c => qiL(c._3 * c._3)).sum
    val osq = cells.filter(c => c._1 < c._2).map(c => qiL(c._3 * c._3)).sum
    val mxo = cells.filter(c => c._1 < c._2).map(c => math.abs(c._3)).max
    val expected = (d.toLong, snapD(trq.toDouble / 1048576.0),
      snapD(dsq.toDouble / 1048576.0), snapD(osq.toDouble / 1048576.0),
      snapD(osq.toDouble / dsq), snapD(mxo))
    val got = SparkEntry.queries("q515_whitening_audit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q516

  test("q516 range shard plan equals the cumulative-cut replay") {
    val mks = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mk")
      .collect().map(_.getLong(0))
    val byM = mks.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (mk, xs) => (mk, xs.length.toLong) }
    val t = byM.map(_._2).sum
    var cum = 0L
    val sharded = byM.map { case (mk, w) =>
      val shard = (cum * 8) / t
      cum += w
      (shard, mk, w)
    }
    val expected = sharded.groupBy(_._1).toSeq.sortBy(_._1).map { case (sh, xs) =>
      val rows = xs.map(_._3).sum
      (sh, xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max, rows,
        snapD(rows.toDouble / t), snapD(math.abs(rows.toDouble / t - 1.0 / 8)))
    }
    val got = SparkEntry.queries("q516_range_shard_plan")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // contiguous, non-overlapping month ranges
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 < b._3)
      case _ =>
    }
  }

  // ---------------------------------------------------------------- q517

  test("q517 diurnal harmonic equals the residue-class DFT replay") {
    val ev = eventRows.map(r => (r._1, Math.floorDiv(r._3, 3600000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val expected = ev.map(_._1).distinct.sorted.toSeq.map { t =>
      val series = (mn to mx).map(h => (h, cnt.getOrElse((t, h), 0L)))
      val n = series.length.toLong
      val sx = series.map(_._2).sum
      val sxx = series.map(s => s._2 * s._2).sum
      val sk = series.groupBy(_._1 % 24).map { case (k, xs) => k -> xs.map(_._2).sum }
      val sa = sk.map { case (k, s) =>
        qiL(s.toDouble * math.cos(2.0 * math.Pi * k / 24.0))
      }.sum
      val sb = sk.map { case (k, s) =>
        qiL(s.toDouble * math.sin(2.0 * math.Pi * k / 24.0))
      }.sum
      val a = 2.0 * sa / 1048576.0 / n
      val bb = 2.0 * sb / 1048576.0 / n
      val sstot = sxx.toDouble - sx.toDouble * sx / n
      (t, n, snapD(a), snapD(bb), snapD(math.sqrt(a * a + bb * bb)),
        snapD((n.toDouble / 2) * (a * a + bb * bb) / sstot))
    }
    val got = SparkEntry.queries("q517_diurnal_harmonic")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // a single harmonic can never explain more than all variance
    assert(got.forall(r => r._6 <= 1.0 + 1e-9))
  }

  // ---------------------------------------------------------------- q518

  test("q518 Jonckheere equals the raw ordered-pair count") {
    val os = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority",
        "CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = os.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, xs) => (p, xs.map(_._2)) }
    // O(n^2) raw pair count — independent of the query's prefix algebra
    var j2 = 0L
    for (i <- groups.indices; j <- (i + 1) until groups.length) {
      for (a <- groups(i)._2; b <- groups(j)._2) {
        if (a < b) j2 += 2 else if (a == b) j2 += 1
      }
    }
    val ns = groups.map(_._2.length.toLong)
    val nn = ns.sum
    val sn2 = ns.map(x => x * x).sum
    val sn23 = ns.map(x => x * x * (2 * x + 3)).sum
    val meanX2 = (nn * nn - sn2) / 2
    val z = (j2.toDouble - nn.toDouble * nn / 2 + sn2.toDouble / 2) /
      (2.0 * math.sqrt((nn.toDouble * nn * (2 * nn + 3) - sn23) / 72))
    val expected = (nn, j2, meanX2, snapD(z), if (math.abs(z) > 1.96) 1 else 0)
    val got = SparkEntry.queries("q518_jonckheere")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
  }
}
