package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-57 differential sweeps — driver references for the Theil
  * between/within decomposition, the Hoover index and the Palma ratio.
  * Independent Scala recomputation from collected rows, replicating the
  * SQL's operation order bit-exactly.
  */
class Round57PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  /** (custkey, nationkey, spend_cents) for customers with orders. */
  private def spend: Seq[(Long, Int, Long)] = {
    val nat = graft.sources.Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (ck, xs) => (ck, nat(ck), xs.map(_._2).sum) }
  }

  // ---------------------------------------------------------------- q588

  test("q588 Theil decomposition equals the two-level quantized fold") {
    val sp = spend
    val n = sp.length.toLong
    val xx = sp.map(_._3).sum
    val t20 = sp.map { case (_, _, x) =>
      val r = x.toDouble * n / xx
      qiL(r * math.log(r))
    }.sum
    val groups = sp.groupBy(_._2).toSeq
    val terms = groups.map { case (_, xs) =>
      val ng = xs.length.toLong
      val xg = xs.map(_._3).sum
      val tg20 = xs.map { case (_, _, x) =>
        val r = x.toDouble * ng / xg
        qiL(r * math.log(r))
      }.sum
      val w20 = qiL((xg.toDouble / xx) * (tg20.toDouble / 1048576.0 / ng))
      val b20 = qiL((xg.toDouble / xx) *
        math.log((xg.toDouble / xx) / (ng.toDouble / n)))
      (w20, b20)
    }
    val sw20 = terms.map(_._1).sum
    val sb20 = terms.map(_._2).sum
    val expected = (n, groups.length.toLong,
      snapD(t20.toDouble / 1048576.0 / n),
      snapD(sb20.toDouble / 1048576.0),
      snapD(sw20.toDouble / 1048576.0),
      snapD(sb20.toDouble / (t20.toDouble / n)))
    val got = SparkEntry.queries("q588_theil_decomposition")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // additivity survives two-level quantization to the grid scale
    assert(math.abs(got._3 - got._4 - got._5) < 1e-4)
    assert(got._3 >= 0.0 && got._4 >= -1e-9)
  }

  // ---------------------------------------------------------------- q589

  test("q589 Hoover equals the integer transfer fold") {
    val sp = spend
    val n = sp.length.toLong
    val xx = sp.map(_._3).sum
    val num = sp.map { case (_, _, x) => math.abs(n * x - xx) }.sum
    val expected = (n, xx, snapD(num.toDouble / (2 * n) / xx))
    val got = SparkEntry.queries("q589_hoover")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._3 >= 0.0 && got._3 < 1.0)
  }

  // ---------------------------------------------------------------- q590

  test("q590 Palma equals the rank-cut fold") {
    val sp = spend
    val n = sp.length.toLong
    val xx = sp.map(_._3).sum
    val ranked = sp.sortBy { case (ck, _, x) => (-x, ck) }.map(_._3)
    val d10 = (n / 10).toInt
    val b40 = (4 * n / 10).toInt
    val top = ranked.take(d10).sum
    val bot = ranked.takeRight(b40).sum
    val expected = (n, top, bot, snapD(top.toDouble / xx),
      snapD(bot.toDouble / xx), snapD(top.toDouble / bot))
    val got = SparkEntry.queries("q590_palma")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // the top decile out-earns the bottom 40% iff palma > 1; shares in [0,1]
    assert(got._4 >= 0.0 && got._4 <= 1.0 && got._5 >= 0.0 && got._5 <= 1.0)
  }
}
