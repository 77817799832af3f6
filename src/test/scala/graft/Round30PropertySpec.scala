package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-30 differential sweeps — driver references for the Erlang-C
  * staffing sheet, the power-iteration eigenpair, and the speculative
  * lookahead curve. Both engines replay the same SQL text, so these
  * independent Scala recomputations are the net for text-level bugs the
  * hash gate cannot see (the q98 class).
  */
class Round30PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  test("q478 staffing sheet equals the driver Erlang-C closed form") {
    import java.time.ZoneOffset
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select("ts").collect().map(_.getTimestamp(0))
    val days = rows.map(_.toInstant.atZone(ZoneOffset.UTC).toLocalDate).distinct.length
    val byHour = rows.groupBy(_.toInstant.atZone(ZoneOffset.UTC).getHour)
      .map { case (h, xs) => h -> xs.length.toLong }
    def powFact(a: Double, k: Int): Double =
      if (k == 0) 1.0 else (1 to k).foldLeft(1.0)((acc, i) => acc * (a / i))
    val expected = byHour.toSeq.sortBy(_._1).flatMap { case (hr, n) =>
      val lam = snapD(n.toDouble / (days * 3600.0))
      val a = snapD(n.toDouble / (days * 3600.0) / 0.125)
      Seq(4, 8, 16).map { c =>
        val rho = snapD(a / c)
        if (a >= c) (hr, n, lam, a, c.toLong, rho, 1.0, -1.0, -1.0)
        else {
          val s0 = (0 until c).map(powFact(a, _)).reduceLeft(_ + _)
          val t = powFact(a, c)
          val pw = t / ((1.0 - a / c) * s0 + t)
          val lq = pw * (a / c) / (1.0 - a / c)
          (hr, n, lam, a, c.toLong, rho, snapD(pw), snapD(lq), snapD(lq / lam))
        }
      }
    }
    val got = SparkEntry.queries("q478_erlang_c")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8))).toSeq
    assert(got == expected, s"got ${got.take(3)}... expected ${expected.take(3)}...")
  }

  test("q479 eigenpair equals the driver power-iteration reference") {
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val n = embs.length
    val d = embs.head._2.length
    // per-dim mean via exact quantized sums, then snapped centering
    val mu = Array.tabulate(d) { j =>
      snapD(embs.map(e => qiL(e._2(j))).sum.toDouble / 1048576.0 / n)
    }
    val c = embs.map { case (_, v) => Array.tabulate(d)(j => snapD(v(j) - mu(j))) }
    val g = Array.tabulate(d, d) { (i, j) =>
      c.map(row => qiL(row(i) * row(j))).sum.toDouble / 1048576.0
    }
    var x = Array.fill(d)(0.125)
    for (_ <- 1 to 8) {
      val y = Array.tabulate(d) { i =>
        (0 until d).map(j => qiL(g(i)(j) * x(j))).sum.toDouble / 1048576.0
      }
      val nm = snapD(math.sqrt(y.map(v => qiL(v * v)).sum.toDouble / 1048576.0))
      x = y.map(v => snapD(v / nm))
    }
    val lambda1Raw = (for (i <- 0 until d; j <- 0 until d)
      yield qiL(x(i) * g(i)(j) * x(j))).sum.toDouble / 1048576.0
    val traceRaw = (0 until d).map(i => qiL(g(i)(i))).sum.toDouble / 1048576.0
    val r = SparkEntry.queries("q479_power_iteration")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getDouble(1) == snapD(lambda1Raw), s"lambda1 ${r.getDouble(1)} != ${snapD(lambda1Raw)}")
    assert(r.getDouble(2) == snapD(traceRaw))
    assert(r.getDouble(3) == snapD(lambda1Raw / traceRaw))
    // sanity: the dominant share is a share
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q480 lookahead curve equals the driver run-length fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val tr = docs.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.length == 2).zipWithIndex.map { case (p, i) => (id, i.toLong, p(0), p(1)) }
    }
    val bg = tr.groupBy(t => (t._3, t._4)).map { case (k, xs) => k -> xs.length.toLong }
    val draft = bg.toSeq.groupBy(_._1._1).map { case (prev, xs) =>
      prev -> xs.minBy { case ((_, nxt), cnt) => (-cnt, nxt) }._1._2
    }
    val runs = tr.groupBy(_._1).values.flatMap { txs =>
      val sorted = txs.sortBy(_._2)
      val oks = sorted.map(t => draft(t._3) == t._4)
      val m = sorted.length
      sorted.indices.map { i =>
        val firstReject = (i until m).find(!oks(_)).getOrElse(m)
        (firstReject - i).toLong
      }
    }.toSeq
    val nPos = runs.length.toLong
    val expected = Seq(1L, 2L, 4L, 8L).map { k =>
      (k, nPos,
        snapD(runs.map(r => math.min(r, k) + 1).sum.toDouble / nPos),
        snapD(runs.count(_ >= k).toDouble / nPos))
    }
    val got = SparkEntry.queries("q480_speculative_lookahead")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // monotone: deeper lookahead never emits fewer tokens per step
    assert(got.map(_._3) == got.map(_._3).sorted)
  }
}
