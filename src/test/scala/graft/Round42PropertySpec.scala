package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-42 differential sweeps — driver references for Dalenius–Hodges
  * strata, calendar Moran's I, dedup shard locality (quadratic pair
  * replay, independent of the PPJoin operator), parity gaps, positional
  * surprisal, and the hash-uniformity audit.
  */
class Round42PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def md5i8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  // ---------------------------------------------------------------- q519

  test("q519 Dalenius-Hodges equals the cum-sqrt-f replay") {
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS c")
      .collect().map(_.getLong(0))
    val bins = cents.groupBy(_ / 50000).toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, qiL(math.sqrt(xs.length.toDouble))) }
    val tot = bins.map(_._2).sum
    var cum = 0L
    val strOf = bins.map { case (b, qf) =>
      val s = (cum * 4) / tot
      cum += qf
      b -> s
    }.toMap
    val expected = cents.groupBy(c => strOf(c / 50000)).toSeq.sortBy(_._1)
      .map { case (st, xs) =>
        val n = xs.length.toLong
        val s1 = xs.map(c => qiL(c / 1000000.0)).sum
        val s2 = xs.map(c => qiL((c / 1000000.0) * (c / 1000000.0))).sum
        val sdu = math.sqrt((s2.toDouble / 1048576.0 -
          (s1.toDouble / 1048576.0 / n) * (s1.toDouble / 1048576.0 / n) * n) / (n - 1))
        (st, n, xs.min, xs.max, snapD(xs.sum.toDouble / n / 100),
          snapD(sdu * 10000.0), qiL(n * sdu))
      }
    val tns = expected.map(_._7).sum
    val exp2 = expected.map { case (st, n, lo, hi, mp, sd, nsq) =>
      (st, n, lo, hi, mp, sd, snapD(nsq.toDouble / tns))
    }
    val got = SparkEntry.queries("q519_dalenius_hodges")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == exp2, s"got $got expected $exp2")
    // strata cover the price axis in order, and shares sum to ~1
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(math.abs(got.map(_._7).sum - 1.0) < 1e-4)
  }

  // ---------------------------------------------------------------- q520

  test("q520 calendar Moran's I equals the torus-edge replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map { r =>
        val us = r.getLong(1)
        (r.getString(0),
          Math.floorDiv(us, 86400000000L) % 7,
          Math.floorDiv(us, 3600000000L) % 24)
      }
    val expected = ev.map(_._1).distinct.sorted.toSeq.map { t =>
      val cnt = ev.filter(_._1 == t).groupBy(e => (e._2, e._3))
        .map { case (k, xs) => k -> xs.length.toLong }
      val s = cnt.values.sum
      def z(d: Long, h: Long): Long = 168L * cnt.getOrElse((d, h), 0L) - s
      var num = 0L
      var den = 0L
      for (d <- 0L to 6L; h <- 0L to 23L) {
        val zz = z(d, h)
        den += zz * zz
        num += zz * z(d, (h + 1) % 24)
        num += zz * z((d + 1) % 7, h)
      }
      (t, s, snapD(num.toDouble / (2 * den)), snapD(-1.0 / 167))
    }
    val got = SparkEntry.queries("q520_calendar_morans_i")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // Moran's I on a 168-cell torus is bounded
    assert(got.forall(r => r._3 > -1.1 && r._3 < 1.1))
  }

  // ---------------------------------------------------------------- q521

  test("q521 dedup locality equals the quadratic pair + shard replay") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val gs = docs.map(d => d._1 -> grams(d._2)).filter(_._2.nonEmpty)
    val pairs = for {
      i <- gs.indices; j <- (i + 1) until gs.length
      (a, ga) = gs(i); (b, gb) = gs(j)
      if ga.size >= gb.size * 0.8 - 1e-9 && gb.size >= ga.size * 0.8 - 1e-9
      inter = ga.intersect(gb).size
      if inter > 0
      jac = BigDecimal(inter.toDouble / ga.union(gb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.8
    } yield (math.min(a, b), math.max(a, b))
    val mn = docs.map(_._1).min
    val mx = docs.map(_._1).max
    def hashShard(id: Long): Long = md5i8(s"shard:$id") % 8
    def rangeShard(id: Long): Long = (id - mn) * 8 / (mx - mn + 1)
    val np = pairs.length.toLong
    val ih = pairs.count { case (a, b) => hashShard(a) == hashShard(b) }.toLong
    val ir = pairs.count { case (a, b) => rangeShard(a) == rangeShard(b) }.toLong
    val expected = Seq(
      ("hash8", np, ih, if (np == 0) 0.0 else snapD(ih.toDouble / np)),
      ("range8", np, ir, if (np == 0) 0.0 else snapD(ir.toDouble / np)))
    val got = SparkEntry.queries("q521_dedup_locality")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q522

  test("q522 parity gaps equal the top-quartile selection replay") {
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val spend = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val rows = cust.map { case (ck, seg) => (ck, seg, spend.getOrElse(ck, 0L)) }
    val n = rows.length.toLong
    val k = (n + 3) / 4
    val ranked = rows.sortBy { case (ck, _, c) => (-c, ck) }
    val selected = ranked.take(k.toInt).map(_._1).toSet
    val per = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, xs) =>
      (seg, xs.length.toLong, xs.count(r => selected(r._1)).toLong)
    }
    val mxr = per.map(p => p._3.toDouble / p._2).max
    val expected = per.map { case (seg, nc, sel) =>
      val rate = sel.toDouble / nc
      (seg, nc, sel, snapD(rate), snapD(mxr - rate), snapD(rate / mxr))
    }
    val got = SparkEntry.queries("q522_parity_gaps")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // exactly ceil(n/4) customers selected overall
    assert(got.map(_._3).sum == k)
  }

  // ---------------------------------------------------------------- q523

  test("q523 positional surprisal equals the decile fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.flatMap { case (_, t) =>
      val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      ws.zipWithIndex.map { case (w, i) =>
        (math.min(9L, i.toLong * 10 / ws.length), w)
      }
    }
    val cw = toks.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val tt = cw.values.sum
    val per = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
      val sq = xs.map { case (_, w) => qiL(-math.log(cw(w).toDouble / tt)) }.sum
      (d, xs.length.toLong, qiL(sq.toDouble / 1048576.0 / xs.length))
    }
    val cnt = per.length.toLong
    val sd = per.map(_._1).sum
    val syq = per.map(_._3).sum
    val sdy = per.map(p => p._1 * p._3).sum
    val sdd = per.map(p => p._1 * p._1).sum
    val slope = (sdy.toDouble - sd.toDouble * syq / cnt) /
      (sdd.toDouble - sd.toDouble * sd / cnt) / 1048576.0
    val expected = per.map { case (d, n, yq) =>
      (d, n, snapD(yq.toDouble / 1048576.0), snapD(slope))
    }
    val got = SparkEntry.queries("q523_positional_surprisal")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q524

  test("q524 hash uniformity equals the direct md5 audit") {
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val vOf = ids.map(id => id -> md5i8(s"key:$id")).toMap
    val n = ids.length.toLong
    val buckets = (0L to 15L).map { b =>
      vOf.values.count(_ / 268435456L == b).toLong
    }
    val chiNum = buckets.map(o => (16 * o - n) * (16 * o - n)).sum
    val chi2 = chiNum.toDouble / (16 * n)
    val maxBitDev = (0 until 32).map { j =>
      val ones = vOf.values.count(v => (v >> j) % 2 == 1).toLong
      math.abs(ones.toDouble / n - 0.5)
    }.max
    val pairs = ids.flatMap(id => vOf.get(id + 1).map(vb => (vOf(id), vb)))
    val np = pairs.length.toLong
    val va = pairs.map(_._1 / 65536L)
    val vb = pairs.map(_._2 / 65536L)
    val (sa, sb) = (va.sum, vb.sum)
    val saa = va.map(x => x * x).sum
    val sbb = vb.map(x => x * x).sum
    val sab = va.zip(vb).map { case (a, b) => a * b }.sum
    val r = (np.toDouble * sab - sa.toDouble * sb) /
      (math.sqrt(np.toDouble * saa - sa.toDouble * sa) *
        math.sqrt(np.toDouble * sbb - sb.toDouble * sb))
    val expected = (n, snapD(chi2),
      if (chi2 > 24.995790139728616) 1 else 0,
      snapD(maxBitDev), np, snapD(r))
    val got = SparkEntry.queries("q524_hash_uniformity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // a healthy splitter: tiny bit skew and near-zero serial correlation
    assert(got._4 < 0.2 && math.abs(got._6) < 0.2)
  }
}
