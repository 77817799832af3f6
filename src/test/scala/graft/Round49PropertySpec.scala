package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-49 differential sweeps — driver references for the Good–Turing
  * spectrum, Yule's K, the Granger two-regression F fold and the Hill
  * tail-index order-statistics fold. Each reference recomputes the
  * statistic from collected rows with independent Scala code (the only
  * shared artifact is the quantization grid), so a text-level SQL bug
  * that fools the shared-oracle hash gate still fails here.
  */
class Round49PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  /** (source, word) token stream — the q419/q427 lowercase alpha-run
    * convention, recomputed driver-side.
    */
  private def tokens: Seq[(String, String)] =
    graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("source", "text").collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split("[^a-z]+")
          .filter(_.nonEmpty).map(w => (r.getString(0), w))
      }.toSeq

  // ---------------------------------------------------------------- q560

  test("q560 Good-Turing equals the driver spectrum fold") {
    val bySource = tokens.groupBy(_._1)
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, toks) =>
      val wc = toks.groupBy(_._2).map { case (_, xs) => xs.length.toLong }
      val n = wc.sum
      val v = wc.size.toLong
      val v1 = wc.count(_ == 1L).toLong
      val v2 = wc.count(_ == 2L).toLong
      val c1 = if (v1 == 0) null else java.lang.Double.valueOf(snapD(2.0 * v2 / v1))
      (src, n, v, v1, v2, snapD(v1.toDouble / n), c1)
    }
    val got = SparkEntry.queries("q560_good_turing")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5),
        if (r.isNullAt(6)) null else java.lang.Double.valueOf(r.getDouble(6)))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // unseen mass is a probability; the spectrum can't exceed the vocab
    got.foreach { r => assert(r._6 >= 0.0 && r._6 <= 1.0 && r._4 <= r._3) }
  }

  // ---------------------------------------------------------------- q561

  test("q561 Yule's K equals the driver repeat-rate fold") {
    val bySource = tokens.groupBy(_._1)
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, toks) =>
      val wc = toks.groupBy(_._2).map { case (_, xs) => xs.length.toLong }
      val n = wc.sum
      val vt = wc.size.toLong
      val s2 = wc.map(c => c * c).sum
      val v1 = wc.count(_ == 1L).toLong
      (src, n, vt, snapD(10000.0 * (s2 - n) / (n.toDouble * n)),
        snapD(v1.toDouble / vt))
    }
    val got = SparkEntry.queries("q561_yule_k")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // K is nonnegative (s2 >= n always, each c*c >= c)
    got.foreach(r => assert(r._4 >= 0.0))
  }

  // ---------------------------------------------------------------- q562

  test("q562 Granger equals the driver two-regression fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val series = (mn to mx).map { d =>
      (cnt.getOrElse(("click", d), 0L), cnt.getOrElse(("view", d), 0L))
    }
    val lagged = series.sliding(2).map { case Seq((ckp, vwp), (ck, vw)) =>
      (ck, vw, ckp, vwp)
    }.toSeq

    def fold(rows: Seq[(Long, Long, Long)]): (Long, Double, Double, Double) = {
      // rows = (y, x1, x2); returns (n, crossCoef, F, ssrRatio)
      val n = rows.length.toLong
      val s1 = rows.map(_._2).sum; val s2 = rows.map(_._3).sum
      val sy = rows.map(_._1).sum
      val s11 = rows.map(r => r._2 * r._2).sum
      val s22 = rows.map(r => r._3 * r._3).sum
      val s12 = rows.map(r => r._2 * r._3).sum
      val s1y = rows.map(r => r._2 * r._1).sum
      val s2y = rows.map(r => r._3 * r._1).sum
      val det = n.toDouble * (s11.toDouble * s22 - s12.toDouble * s12) -
        s1.toDouble * (s1.toDouble * s22 - s12.toDouble * s2) +
        s2.toDouble * (s1.toDouble * s12 - s11.toDouble * s2)
      val deta = sy.toDouble * (s11.toDouble * s22 - s12.toDouble * s12) -
        s1.toDouble * (s1y.toDouble * s22 - s12.toDouble * s2y) +
        s2.toDouble * (s1y.toDouble * s12 - s11.toDouble * s2y)
      val detb = n.toDouble * (s1y.toDouble * s22 - s12.toDouble * s2y) -
        sy.toDouble * (s1.toDouble * s22 - s12.toDouble * s2) +
        s2.toDouble * (s1.toDouble * s2y - s1y.toDouble * s2)
      val detc = n.toDouble * (s11.toDouble * s2y - s1y.toDouble * s12) -
        s1.toDouble * (s1.toDouble * s2y - s1y.toDouble * s2) +
        sy.toDouble * (s1.toDouble * s12 - s11.toDouble * s2)
      val a = deta / det; val b = detb / det; val c = detc / det
      val br = (n.toDouble * s1y - s1.toDouble * sy) / (n.toDouble * s11 - s1.toDouble * s1)
      val ar = (sy.toDouble - br * s1) / n
      val ssru = rows.map { r =>
        val e = r._1 - a - b * r._2 - c * r._3; qiL(e * e)
      }.sum
      val ssrr = rows.map { r =>
        val e = r._1 - ar - br * r._2; qiL(e * e)
      }.sum
      val f = (ssrr - ssru).toDouble / (ssru.toDouble / (n - 3))
      (n, c, f, ssrr.toDouble / ssru)
    }

    val cv = fold(lagged.map { case (_, vw, ckp, vwp) => (vw, vwp, ckp) })
    val vc = fold(lagged.map { case (ck, _, ckp, vwp) => (ck, ckp, vwp) })
    val expected = Seq(
      ("click_to_view", cv._1, snapD(cv._2), snapD(cv._3), snapD(cv._4)),
      ("view_to_click", vc._1, snapD(vc._2), snapD(vc._3), snapD(vc._4)))
    val got = SparkEntry.queries("q562_granger")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // adding a regressor can't raise SSR: F >= 0, ratio >= ~1 (up to grid)
    got.foreach { r => assert(r._4 >= -1e-6 && r._5 >= 1.0 - 1e-6) }
  }

  // ---------------------------------------------------------------- q563

  test("q563 Hill tail equals the driver order-statistics fold") {
    val nw = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).length.toLong))
      .filter(_._2 > 0)
    val ranked = nw.sortBy { case (id, n) => (-n, id) }.map(_._2)
    val expected = Seq(10L, 25L, 50L).map { k =>
      val xk1 = ranked(k.toInt) // 0-based: rank k+1
      val slq = ranked.take(k.toInt).map(x => qiL(math.log(x.toDouble / xk1))).sum
      val alpha =
        if (slq == 0) null
        else java.lang.Double.valueOf(snapD(k.toDouble / (slq.toDouble / 1048576.0)))
      val fm = if (slq == 0) null
        else java.lang.Integer.valueOf(if (k.toDouble / (slq.toDouble / 1048576.0) > 1.0) 1 else 0)
      val fv = if (slq == 0) null
        else java.lang.Integer.valueOf(if (k.toDouble / (slq.toDouble / 1048576.0) > 2.0) 1 else 0)
      (k, xk1, alpha, fm, fv)
    }
    val got = SparkEntry.queries("q563_hill_tail")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
        if (r.isNullAt(3)) null else java.lang.Integer.valueOf(r.getInt(3)),
        if (r.isNullAt(4)) null else java.lang.Integer.valueOf(r.getInt(4)))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the tail threshold shrinks as k grows (deeper into the tail)
    assert(got.map(_._2) == got.map(_._2).sortBy(-_))
  }
}
