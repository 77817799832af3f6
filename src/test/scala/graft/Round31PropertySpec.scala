package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-31 differential sweeps — driver references for the rate-limit
  * replay, Krippendorff's alpha, and the Luhn card scan (plus direct
  * kernel goldens for [[graft.functions.LuhnCheck]]).
  */
class Round31PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  test("LuhnCheck kernel matches the textbook checksum") {
    import org.apache.spark.unsafe.types.UTF8String
    def v(s: String) = graft.functions.LuhnCheck.valid(UTF8String.fromString(s))
    assert(v("4532015112830366")) // Luhn-valid test PAN
    assert(!v("4532015112830367")) // off-by-one twin
    assert(v("49927398716")) // the classic worked example
    assert(!v("49927398717"))
    assert(v("00")) // zero-sum degenerate
    assert(!v("1")) // below minimum length
    assert(!v("")) // empty
    assert(!v("49927 398716")) // any non-digit invalidates
    assert(!v("4992739871a"))
  }

  test("q481 replay equals the driver sliding-window count") {
    val evs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(unix_micros(ts) AS BIGINT) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = evs.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    // RANGE frame is VALUE-based: every event of the user inside
    // [t - 59999999, t] counts, including equal-timestamp peers.
    val wins = byUser.toSeq.flatMap { case (u, ts) =>
      ts.map(t => (u, ts.count(x => x >= t - 59999999L && x <= t)))
    }
    val expected = Seq(10L, 60L).map { lim =>
      val over = wins.filter(_._2 > lim)
      (lim, wins.size.toLong, over.size.toLong,
        snapD(over.size.toDouble / wins.size),
        over.map(_._1).distinct.size.toLong)
    }
    val got = SparkEntry.queries("q481_rate_limit_replay")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q482 alpha equals the driver coincidence-matrix fold") {
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUnit = rows.groupBy(_._1).filter(_._2.length >= 2)
    val n = byUnit.values.map(_.length.toLong).sum
    val nUnits = byUnit.size.toLong
    // o_ck in 2^20 micro-units via per-term quantization
    val o = scala.collection.mutable.Map.empty[(String, String), Long]
    byUnit.values.foreach { xs =>
      val m = xs.length
      val counts = xs.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
      for ((vc, cc) <- counts; (vk, ck) <- counts) {
        val term = cc * (ck - (if (vc == vk) 1L else 0L)) / (m - 1).toDouble
        o((vc, vk)) = o.getOrElse((vc, vk), 0L) + qiL(term)
      }
    }
    val nc = o.groupBy(_._1._1).map { case (c, xs) => c -> xs.values.sum.toDouble / 1048576.0 }
    val dOff = o.collect { case ((c, k), q) if c != k => q }.sum.toDouble / 1048576.0
    val eOff = (for ((c, a) <- nc; (k, b) <- nc if c != k) yield qiL(a * b)).sum.toDouble / 1048576.0
    val dObs = dOff / n
    val dExp = eOff / (n * (n - 1).toDouble)
    val r = SparkEntry.queries("q482_krippendorff_alpha")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == nUnits)
    assert(r.getDouble(2) == snapD(dObs), s"d_obs ${r.getDouble(2)} != ${snapD(dObs)}")
    assert(r.getDouble(3) == snapD(dExp))
    assert(r.getDouble(4) == snapD(1.0 - dObs / dExp))
  }

  test("q483 scan equals the driver regex + Luhn fold") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val re = "[0-9]{13,19}".r
    val cands = docs.flatMap { case (id, text) =>
      val t = text +
        (id % 3 match {
          case 0 => " card 4532015112830366"
          case 1 => " card 4532015112830367"
          case _ => ""
        }) +
        (if (id % 5 == 0) " ref 12345678901234" else "")
      re.findAllIn(t).map(num => (id, num)).toSeq
    }
    val ok = cands.map { case (id, num) =>
      (id, graft.functions.LuhnCheck.valid(UTF8String.fromString(num)))
    }
    val nValid = ok.count(_._2).toLong
    val r = SparkEntry.queries("q483_luhn_card_scan")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == cands.length.toLong)
    assert(r.getLong(1) == nValid)
    assert(r.getLong(2) == cands.length - nValid)
    assert(r.getLong(3) == ok.filter(_._2).map(_._1).distinct.length.toLong)
    assert(r.getDouble(4) == snapD(nValid.toDouble / cands.length))
    // the injection seeds real positives: the scan must find them
    assert(nValid > 0 && nValid < cands.length)
  }
}
