package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-58 differential sweeps — driver references for the
  * beta-binomial shrink, the James–Stein nation means and the BIC
  * seasonality Bayes factor. Independent Scala recomputation from
  * collected rows, replicating the SQL's operation order bit-exactly.
  */
class Round58PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  // ---------------------------------------------------------------- q591

  test("q591 beta-binomial shrink equals the MoM fold") {
    val users = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, xs) =>
        (xs.length.toLong, xs.count(_._2 == "purchase").toLong)
      }
    val nu = users.length.toLong
    val nn = users.map(_._1).sum
    val kk = users.map(_._2).sum
    val sq20 = users.map { case (n, k) =>
      qiL((k.toDouble / n) * (k.toDouble / n))
    }.sum
    val sp20 = users.map { case (n, k) => qiL(k.toDouble / n) }.sum
    val pbar = kk.toDouble / nn
    val s2 = (sq20.toDouble / 1048576.0 / nu) -
      (sp20.toDouble / 1048576.0 / nu) * (sp20.toDouble / 1048576.0 / nu)
    val m = math.min(math.max(pbar * (1 - pbar) / s2 - 1, 1.0), 1000000.0)
    val shr = users.map { case (n, k) =>
      val raw = k.toDouble / n
      val post = (k + m * pbar) / (n + m)
      (raw, post)
    }
    val sabs20 = shr.map { case (r, p) => qiL(math.abs(p - r)) }.sum
    val mx20 = qiL(shr.map { case (r, p) => math.abs(p - r) }.max)
    val flips = shr.count { case (r, p) => (r - pbar) * (p - pbar) < 0 }.toLong
    val expected = (nu, snapD(pbar), snapD(m),
      snapD(sabs20.toDouble / 1048576.0 / nu), snapD(mx20.toDouble / 1048576.0),
      flips)
    val got = SparkEntry.queries("q591_beta_binomial_shrink")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).head
    assert(got == expected, s"got $got expected $expected")
    // shrinkage is a contraction: it never carries a user across p̄
    assert(got._6 == 0L)
  }

  // ---------------------------------------------------------------- q592

  test("q592 James-Stein equals the shrink fold") {
    val nat = graft.sources.Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val o = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c").collect()
      .map(r => (nat(r.getLong(0)), r.getLong(1)))
    val groups = o.groupBy(_._1).toSeq.sortBy(_._1)
    val nn = o.length.toLong
    val scc = o.map(_._2).sum
    val grand = scc.toDouble / nn / 100
    val per = groups.map { case (nk, xs) =>
      val n = xs.length.toLong
      val sc = xs.map(_._2).sum
      val sq20 = xs.map { case (_, c) =>
        qiL((c.toDouble / 1048576) * (c.toDouble / 1048576))
      }.sum
      val xbar = sc.toDouble / n / 100
      val se2 = ((sq20.toDouble * 1048576.0 / n) -
        (sc.toDouble / n) * (sc.toDouble / n)) / 10000 / n
      (nk, n, xbar, se2)
    }
    val k = per.length.toLong
    val sv20 = per.map(p => qiL(p._4)).sum
    val sd20 = per.map(p => qiL((p._3 - grand) * (p._3 - grand))).sum
    val b = math.max(
      1.0 - (k - 3) * (sv20.toDouble / k) / sd20.toDouble, 0.0)
    val expected = per.map { case (nk, n, xbar, _) =>
      (nk, n, snapD(xbar), snapD(grand + b * (xbar - grand)), snapD(b))
    }
    val got = SparkEntry.queries("q592_james_stein")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // shrunk means sit between raw mean and grand mean
    got.foreach { case (_, _, raw, js, bf) =>
      assert(bf >= 0.0 && bf <= 1.0 + 1e-9)
      assert((js - raw) * (js - snapD(grand)) <= 1e-6)
    }
  }

  // ---------------------------------------------------------------- q593

  test("q593 BIC seasonality equals the two-model fold") {
    val ds = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect()
      .map(r => Math.floorDiv(r.getLong(0), 86400000000L))
    val cnt = ds.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val ys = (ds.min to ds.max).map(d => (d, ((d % 7) + 7) % 7, cnt.getOrElse(d, 0L)))
    val n = ys.length.toLong
    val sy = ys.map(_._3).sum
    val syy = ys.map(y => y._3 * y._3).sum
    val sse0 = syy.toDouble - sy.toDouble * sy / n
    val sse20 = ys.groupBy(_._2).map { case (_, xs) =>
      val ng = xs.length.toLong
      val syg = xs.map(_._3).sum
      val syyg = xs.map(y => y._3 * y._3).sum
      qiL(syyg.toDouble - syg.toDouble * syg / ng)
    }.sum
    val sse1 = sse20.toDouble / 1048576.0
    val bic0 = n * math.log(sse0 / n) + 1 * math.log(n.toDouble)
    val bic1 = n * math.log(sse1 / n) + 7 * math.log(n.toDouble)
    val lnBf = (bic0 - bic1) / 2
    val expected = (n, snapD(sse0), snapD(sse1), snapD(bic0), snapD(bic1),
      snapD(lnBf), if (lnBf > 3.0) 1 else 0)
    val got = SparkEntry.queries("q593_bic_seasonality")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6))).head
    assert(got == expected, s"got $got expected $expected")
    // the 7-parameter model can only lower the raw SSE
    assert(got._3 <= got._2 + 1e-6)
  }
}
