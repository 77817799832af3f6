package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-50 differential sweeps — driver references for the
  * successive-halving replay (independent sequential elimination walk),
  * the Benford χ² fold, the record-counting walk and the SPRT
  * trajectory. Independent Scala recomputation from collected rows;
  * only the quantization grids are shared with the queries.
  */
class Round50PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q564

  test("q564 successive halving equals the sequential elimination walk") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us", "value").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L), r.getDouble(2)))
    val mn = ev.map(_._2).min
    // (arm, block) -> (n, quantized sum)
    val bm = ev.map { case (a, d, v) => ((a, (d - mn) / 7), qiL(v)) }
      .filter { case ((_, b), _) => b >= 0 && b <= 2 }
      .groupBy(_._1)
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._2).sum) }
    def round(arms: Seq[String], blk: Long, keep: Int): (Seq[(String, Long, Double, Long, Int)], Seq[String]) = {
      val scored = arms.map { a =>
        val (n, sq) = bm((a, blk))
        (a, n, sq.toDouble / 1048576.0 / n)
      }.sortBy { case (a, _, m) => (-m, a) }
      val rows = scored.zipWithIndex.map { case ((a, n, m), i) =>
        (a, n, snapD(m), (i + 1).toLong, if (i + 1 <= keep) 1 else 0)
      }
      (rows, rows.filter(_._5 == 1).map(_._1))
    }
    val arms0 = ev.map(_._1).distinct.sorted
    val (rows1, s1) = round(arms0, 0, 3)
    val (rows2, s2) = round(s1, 1, 2)
    val (rows3, _) = round(s2, 2, 1)
    val expected =
      rows1.map(r => (1, r._1, r._2, r._3, r._4, r._5)) ++
        rows2.map(r => (2, r._1, r._2, r._3, r._4, r._5)) ++
        rows3.map(r => (3, r._1, r._2, r._3, r._4, r._5))
    val got = SparkEntry.queries("q564_successive_halving")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // exactly one survivor
    assert(got.count(r => r._1 == 3 && r._6 == 1) == 1)
  }

  // ---------------------------------------------------------------- q565

  test("q565 Benford equals the driver first-digit fold") {
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
      .filter(_ > 0)
    val nt = cents.length.toLong
    val obs = cents.map(_.toString.charAt(0).asDigit)
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val cells = (1 to 9).map { d =>
      val peq = qiL(math.log(1.0 + 1.0 / d) / math.log(10.0))
      val cnt = obs.getOrElse(d, 0L)
      val pe = peq.toDouble / 1048576.0
      val po = cnt.toDouble / nt
      (d, cnt, peq, qiL((po - pe) * (po - pe) / pe))
    }
    val chi = cells.map(_._4).sum.toDouble / 1048576.0 * nt
    val expected = cells.map { case (d, cnt, peq, _) =>
      (d, cnt, snapD(cnt.toDouble / nt), snapD(peq.toDouble / 1048576.0),
        snapD(chi), if (chi > 15.51) 1 else 0)
    }
    val got = SparkEntry.queries("q565_benford")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // shares are distributions (up to the snap grid)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
  }

  // ---------------------------------------------------------------- q566

  test("q566 records equals the running-maximum walk") {
    val ds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val series = (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
    var pm = Long.MinValue
    var nRec = 0L
    var lastRec = -1L
    series.zipWithIndex.foreach { case (y, i) =>
      if (y > pm) { nRec += 1; lastRec = i.toLong; pm = y }
    }
    val hq = series.indices.map(i => qiL(1.0 / (i + 1))).sum
    val expected = (series.length.toLong, nRec,
      snapD(hq.toDouble / 1048576.0),
      snapD(nRec.toDouble - hq.toDouble / 1048576.0), lastRec)
    val got = SparkEntry.queries("q566_records")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).head
    assert(got == expected, s"got $got expected $expected")
    // day 0 is always a record; records can't exceed days
    assert(got._2 >= 1 && got._2 <= got._1)
  }

  // ---------------------------------------------------------------- q567

  test("q567 SPRT equals the sequential LLR walk") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L)))
    val byDay = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, xs) =>
      (xs.count(_._1 == "click").toLong, xs.length.toLong)
    }
    val p0 = byDay.map(_._1).sum.toDouble / byDay.map(_._2).sum
    val p1 = p0 + 0.05
    val lsq = qiL(math.log(p1 / p0))
    val lfq = qiL(math.log((1.0 - p1) / (1.0 - p0)))
    val bq = qiL(math.log(19.0))
    var llr = 0L
    var tCross = -1L
    var finalLlr = 0L
    var t = 0L
    byDay.foreach { case (c, n) =>
      if (tCross < 0) {
        t += 1
        llr += c * lsq + (n - c) * lfq
        if (llr >= bq || llr <= -bq) { tCross = t }
        finalLlr = llr
      }
    }
    val decided = if (tCross >= 0) 1 else 0
    val decision =
      if (tCross < 0) "continue"
      else if (finalLlr >= bq) "accept_h1"
      else "accept_h0"
    val expected = (snapD(p0), snapD(p1),
      if (tCross >= 0) tCross else byDay.length.toLong,
      decided, decision, snapD(finalLlr.toDouble / 1048576.0))
    val got = SparkEntry.queries("q567_sprt")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2),
        r.getInt(3), r.getString(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // with H0-generated data the walk must not accept H1
    assert(got._5 != "accept_h1")
  }
}
