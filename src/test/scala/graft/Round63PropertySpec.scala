package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-63 differential sweeps — driver references for the forecast
  * duel, conformal coverage and forecast combination. Independent Scala
  * recomputation from collected rows, replicating the SQL's operation
  * order bit-exactly.
  */
class Round63PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  /** (t, y, y1, y7, holdout) for the zero-filled daily series. */
  private def series: IndexedSeq[(Long, Long, Option[Long], Option[Long], Boolean)] = {
    val ds = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val ys = (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
    val tmax = ys.length - 1
    ys.zipWithIndex.map { case (y, t) =>
      (t.toLong, y,
        if (t >= 1) Some(ys(t - 1)) else None,
        if (t >= 7) Some(ys(t - 7)) else None,
        t > tmax - 7)
    }
  }

  // ---------------------------------------------------------------- q605

  test("q605 forecast duel equals the holdout fold") {
    // holdout rows with an undefined lag are excluded (tiny-corpus guard:
    // sum() skips NULL terms but count(*) would not — the SQL filters
    // them, so the fold must too)
    val te = series.filter(r => r._5 && r._3.nonEmpty && r._4.nonEmpty)
    def agg(pick: ((Long, Long, Option[Long], Option[Long], Boolean)) => Long,
            name: String) = {
      val n = te.length.toLong
      val sae = te.map(r => math.abs(pick(r) - r._2)).sum
      val sbias = te.map(r => pick(r) - r._2).sum
      val sse = te.map(r => (pick(r) - r._2) * (pick(r) - r._2)).sum
      val smape20 = te.map { r =>
        val f = pick(r); val y = r._2
        qiL(if (math.abs(f) + math.abs(y) == 0) 0.0
        else 2 * math.abs(f - y).toDouble / (math.abs(f) + math.abs(y)))
      }.sum
      val sseN = te.map(r => (r._3.get - r._2) * (r._3.get - r._2)).sum
      (name, n, snapD(sae.toDouble / n), snapD(sbias.toDouble / n),
        snapD(smape20.toDouble / 1048576.0 / n),
        snapD(math.sqrt(sse.toDouble) / math.sqrt(sseN.toDouble)))
    }
    val expected = Seq(agg(_._3.get, "naive"), agg(_._4.get, "seasonal_naive"))
      .sortBy(_._1)
    val got = SparkEntry.queries("q605_forecast_duel")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the naive row's Theil U2 is identically 1
    assert(got.find(_._1 == "naive").get._6 == 1.0)
  }

  // ---------------------------------------------------------------- q606

  test("q606 conformal coverage equals the order-statistic fold") {
    val s = series
    val tr = s.filter(r => !r._5 && r._3.nonEmpty)
      .map(r => (math.abs(r._2 - r._3.get), r._1)).sortBy(identity)
    val m = tr.length.toLong
    val q90 = tr(((9 * m + 9) / 10 - 1).toInt)._1
    val te = s.filter(r => r._5 && r._3.nonEmpty)
    val covered = te.count(r => math.abs(r._2 - r._3.get) <= q90).toLong
    val expected = (m, q90, te.length.toLong, covered,
      snapD(covered.toDouble / te.length))
    val got = SparkEntry.queries("q606_conformal_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._5 >= 0.0 && got._5 <= 1.0)
  }

  // ---------------------------------------------------------------- q607

  test("q607 forecast combo equals the x2-grid fold") {
    val te = series.filter(r => r._5 && r._3.nonEmpty && r._4.nonEmpty)
    val n = te.length.toLong
    val s4n = te.map(r => { val e = 2 * r._2 - 2 * r._3.get; e * e }).sum
    val s4s = te.map(r => { val e = 2 * r._2 - 2 * r._4.get; e * e }).sum
    val s4c = te.map(r => { val e = 2 * r._2 - (r._3.get + r._4.get); e * e }).sum
    val expected = (n, snapD(s4n.toDouble / 4), snapD(s4s.toDouble / 4),
      snapD(s4c.toDouble / 4), if (s4c < s4n && s4c < s4s) 1 else 0)
    val got = SparkEntry.queries("q607_forecast_combo")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    // the combo SSE can never exceed twice the better parent (parallelogram law)
    assert(got._4 <= (got._2 + got._3) / 2 + 1e-9 ||
      got._4 <= math.max(got._2, got._3))
  }
}
