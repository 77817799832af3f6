package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-51 differential sweeps — driver references for the tail-
  * dependence rank fold, the Little's-law session/instant walk and the
  * Allan-variance block fold. Independent Scala recomputation from
  * collected rows; only the quantization grids are shared.
  */
class Round51PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  private def dailyCkVw: IndexedSeq[(Long, Long)] = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    (mn to mx).map(d => (cnt.getOrElse(("click", d), 0L), cnt.getOrElse(("view", d), 0L)))
  }

  // ---------------------------------------------------------------- q568

  test("q568 tail dependence equals the driver rank fold") {
    val s = dailyCkVw
    val n = s.length.toLong
    val idx = s.indices.map(_.toLong)
    def topK(vals: IndexedSeq[Long], k: Long): Set[Long] =
      idx.sortBy(i => (-vals(i.toInt), i)).take(k.toInt).toSet
    val expected = Seq(75L, 90L).map { q =>
      val k = math.ceil((100.0 - q) * n / 100).toLong
      val both = (topK(s.map(_._1), k) intersect topK(s.map(_._2), k)).size.toLong
      (q, n, k, both, snapD(both.toDouble / k), snapD(k.toDouble / n))
    }
    val got = SparkEntry.queries("q568_tail_dependence")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // lambda_u is a conditional probability
    got.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
  }

  // ---------------------------------------------------------------- q569

  test("q569 Little's law equals the session/instant walk") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ts = xs.map(_._2).sorted
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var lo = ts.head; var hi = ts.head
      ts.tail.foreach { t =>
        if (t - hi > 1800000000L) { buf += ((lo, hi)); lo = t; hi = t }
        else hi = t
      }
      buf += ((lo, hi))
      buf
    }
    val t0 = sessions.map(_._1).min
    val t1 = sessions.map(_._2).max
    val nSess = sessions.length.toLong
    val durUs = sessions.map(s => s._2 - s._1).sum
    val h0 = math.ceil(t0.toDouble / 3600000000L).toLong
    val h1 = Math.floorDiv(t1, 3600000000L)
    val nInst = h1 - h0 + 1
    val tot = (h0 to h1).map { h =>
      val inst = h * 3600000000L
      sessions.count(s => s._1 <= inst && s._2 >= inst).toLong
    }.sum
    val expected = (nSess,
      snapD(durUs.toDouble / nSess / 1000000),
      snapD(nSess.toDouble * 3600000000L / (t1 - t0)),
      snapD(durUs.toDouble / (t1 - t0)),
      snapD(tot.toDouble / nInst),
      snapD(tot.toDouble / nInst - durUs.toDouble / (t1 - t0)))
    val got = SparkEntry.queries("q569_littles_law")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // a sampled reading is nonnegative and bounded by the session count
    assert(got._5 >= 0.0 && got._5 <= got._1)
  }

  // ---------------------------------------------------------------- q570

  test("q570 Allan variance equals the block fold") {
    val ds = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val series = (ds.min to ds.max).map(d => cnt.getOrElse(d, 0L))
    val expected = Seq(1L, 2L, 4L).map { tau =>
      val sums = series.grouped(tau.toInt).filter(_.length == tau.toInt)
        .map(_.sum).toIndexedSeq
      val diffs = sums.sliding(2).map { case Seq(a, b) => b - a }.toSeq
      val m1 = diffs.length.toLong
      val sd2 = diffs.map(d => d * d).sum
      (tau, m1 + 1, snapD(sd2.toDouble / (2 * m1 * tau * tau)), sd2, m1)
    }
    val avar = expected.map(e => e._1 -> (e._4, e._5)).toMap
    val rows = expected.map { case (tau, m, av, _, _) =>
      val ratio = avar.get(tau / 2).filter(_ => tau >= 2).map { case (psd2, pm1) =>
        snapD((avar(tau)._1.toDouble / (2 * avar(tau)._2 * tau * tau)) /
          (psd2.toDouble / (2 * pm1 * (tau / 2) * (tau / 2))))
      }
      (tau, m, av, ratio)
    }
    val got = SparkEntry.queries("q570_allan_variance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == rows, s"got $got expected $rows")
    // variance is nonnegative
    got.foreach(r => assert(r._3 >= 0.0))
  }
}
