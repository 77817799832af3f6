package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-44 differential sweeps. q530's IVF/brute stages already have
  * independent-implementation parity (JVM operators vs the SQL replay
  * oracle); the test here re-derives the COLLAPSE and recall stages
  * from the operator outputs with a third implementation (JVM loop
  * cosine), plus structural invariants. The rest are full driver folds.
  */
class Round44PropertySpec extends AnyFunSuite {

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
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---------------------------------------------------------------- q530

  test("q530 funnel collapse/recall equal the JVM-loop replay") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val iv = graft.operators.Similarity.ivfTopK(emb, probes, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val br = graft.operators.Similarity.bruteTopK(emb, probes, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = iv.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, rs) =>
      val sorted = rs.sortBy(_._3)
      val kept = sorted.filter { b =>
        !sorted.exists(a => a._3 < b._3 && cos(vecs(a._2), vecs(b._2)) >= 0.98)
      }
      val hits = rs.count(r => br((q, r._2))).toLong
      (q, rs.length.toLong, kept.length.toLong,
        rs.length.toLong - kept.length, snapD(hits.toDouble / 5))
    }
    val got = SparkEntry.queries("q530_retrieval_funnel")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.forall(r => r._3 <= r._2 && r._2 <= 5 && r._5 >= 0.0 && r._5 <= 1.0))
  }

  // ---------------------------------------------------------------- q531

  test("q531 MASE equals the lag replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 3600000000L)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val cnt = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val expected = ev.map(_._1).distinct.sorted.toSeq.map { t =>
      val xs = (mn to mx).map(h => cnt.getOrElse((t, h), 0L))
      val scored = (24 until xs.length).map { i =>
        (math.abs(xs(i) - xs(i - 1)), math.abs(xs(i) - xs(i - 24)))
      }
      val n = scored.length.toLong
      val e1 = scored.map(_._1).sum
      val e24 = scored.map(_._2).sum
      (t, n, snapD(e1.toDouble / n), snapD(e24.toDouble / n),
        snapD(e24.toDouble / e1))
    }
    val got = SparkEntry.queries("q531_seasonal_naive_mase")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q532

  test("q532 salting effect equals the md5 partition replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = ev.length.toLong
    val plain = ev.groupBy(e => md5i8(s"p:${e._2}") % 32)
      .map(_._2.length.toLong)
    val salted = ev.groupBy(e => md5i8(s"p:${e._2}:${e._1 % 8}") % 32)
      .map(_._2.length.toLong)
    def row(name: String, parts: Iterable[Long]) =
      (name, parts.size.toLong, snapD(parts.max.toDouble / n),
        snapD(parts.max.toDouble * 32 / n))
    val expected = Seq(row("plain", plain), row("salted8", salted))
    val got = SparkEntry.queries("q532_salting_effect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // salting never increases the worst partition
    assert(got(1)._3 <= got(0)._3 + 1e-9)
  }

  // ---------------------------------------------------------------- q533

  test("q533 EM equals the 3-iteration driver fold") {
    val zs = graft.sources.Tables.events(spark, sfDir)
      .select("value").collect().map(_.getDouble(0) / 100.0)
    val n = zs.length.toLong
    val s1 = zs.map(z => qiL(z)).sum
    val s2 = zs.map(z => qiL(z * z)).sum
    val sorted = zs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.length.toLong) }
    def quantile(p: Long): Double = {
      var cum = 0L
      sorted.collectFirst { case (v, c) if { cum += c; cum >= p } => v }.get
    }
    val v0 = math.max(0.0001, s2.toDouble / 1048576.0 / n -
      (s1.toDouble / 1048576.0 / n) * (s1.toDouble / 1048576.0 / n))
    var (w1, m1, vv1, m2, vv2) =
      (0.5, quantile((n + 3) / 4), v0, quantile((3 * n + 3) / 4), v0)
    for (_ <- 1 to 3) {
      def phi(z: Double, mu: Double, v: Double): Double =
        math.exp(-(z - mu) * (z - mu) / (2.0 * v)) / math.sqrt(v)
      val rs = zs.map { z =>
        val a = w1 * phi(z, m1, vv1)
        (z, a / (a + (1.0 - w1) * phi(z, m2, vv2)))
      }
      val sr1 = rs.map { case (_, r) => qiL(r) }.sum
      val sx1 = rs.map { case (z, r) => qiL(r * z) }.sum
      val sxx1 = rs.map { case (z, r) => qiL(r * z * z) }.sum
      val sx2 = rs.map { case (z, r) => qiL((1.0 - r) * z) }.sum
      val sxx2 = rs.map { case (z, r) => qiL((1.0 - r) * z * z) }.sum
      val d2 = n * 1048576L - sr1
      w1 = sr1.toDouble / 1048576.0 / n
      m1 = sx1.toDouble / sr1
      vv1 = math.max(0.0001,
        sxx1.toDouble / sr1 - (sx1.toDouble / sr1) * (sx1.toDouble / sr1))
      m2 = sx2.toDouble / d2
      vv2 = math.max(0.0001,
        sxx2.toDouble / d2 - (sx2.toDouble / d2) * (sx2.toDouble / d2))
    }
    val expected = (3, snapD(w1), snapD(m1 * 100.0), snapD(math.sqrt(vv1) * 100.0),
      snapD(m2 * 100.0), snapD(math.sqrt(vv2) * 100.0))
    val got = SparkEntry.queries("q533_em_gaussian2")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // the two components stay ordered and weights stay proper
    assert(got._2 > 0.0 && got._2 < 1.0 && got._3 <= got._5)
  }

  // ---------------------------------------------------------------- q534

  test("q534 Bayes A/B equals the grid-integration replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c")
      .collect().map(r => (md5i8(s"arm:${r.getLong(0)}") % 2, r.getInt(1).toLong))
    def stat(arm: Long) = {
      val g = ev.filter(_._1 == arm)
      (g.length.toLong, g.map(_._2).sum)
    }
    val (na, xa) = stat(0)
    val (nb, xb) = stat(1)
    val grid = (1 to 511).map { i =>
      val p = i.toDouble / 512
      (xa * math.log(p) + (na - xa) * math.log(1.0 - p),
        xb * math.log(p) + (nb - xb) * math.log(1.0 - p))
    }
    val ma = grid.map(_._1).max
    val mb = grid.map(_._2).max
    val w = grid.map { case (ta, tb) =>
      (qiL(math.exp(ta - ma)), qiL(math.exp(tb - mb)))
    }
    val za = w.map(_._1).sum
    val zb = w.map(_._2).sum
    var cb = 0L
    var num = 0L
    w.foreach { case (wa, wb) =>
      num += qiL((wa.toDouble / 1048576.0) * (cb.toDouble / 1048576.0 + 0.5 * wb / 1048576.0))
      cb += wb
    }
    val p = (num.toDouble / 1048576.0) / ((za.toDouble / 1048576.0) * (zb.toDouble / 1048576.0))
    val expected = (na, xa, nb, xb,
      snapD((xa + 1).toDouble / (na + 2)), snapD((xb + 1).toDouble / (nb + 2)), snapD(p))
    val got = SparkEntry.queries("q534_bayes_ab")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).head
    assert(got == expected, s"got $got expected $expected")
    assert(got._7 >= 0.0 && got._7 <= 1.0)
  }

  // ---------------------------------------------------------------- q535

  test("q535 key fragmentation equals the direct-sort replay") {
    val keys = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val n = keys.length.toLong
    val span = keys.last - keys.head + 1
    val gaps = keys.sliding(2).map { case Array(a, b) => b - a - 1 }.toSeq
    val runs = keys.zipWithIndex.groupBy { case (k, i) => k - i }
      .map(_._2.length.toLong)
    val expected = (n, span, snapD(n.toDouble / span), runs.size.toLong,
      runs.max, gaps.count(_ > 0).toLong, gaps.max)
    val got = SparkEntry.queries("q535_key_fragmentation")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got == expected, s"got $got expected $expected")
    // runs and gaps interleave
    assert(got._6 == got._4 - 1)
  }
}
