package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-36 differential sweeps — driver references for the P–K sheet,
  * the randomized-response inversion, and the hash-ring balance.
  */
class Round36PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md5i8(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
  private def md5i12(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(12), 16)

  private lazy val events = graft.sources.Tables.events(spark, sfDir)
    .selectExpr("CAST(unix_micros(ts) AS BIGINT) us", "user_id", "event_type", "value")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("q494 P-K sheet equals the driver closed forms") {
    val sec = (events.map(_._1).max - events.map(_._1).min) / 1000000.0
    val expected = events.groupBy(_._3).toSeq.sortBy(_._1).map { case (tp, xs) =>
      val n = xs.length.toLong
      val cents = xs.map(x => math.round(x._4 * 100))
      val lam = snapD(n / sec)
      val es = snapD(cents.sum.toDouble / n / 100.0)
      val es2 = snapD(cents.map(c => c * c).sum.toDouble / n / 10000.0)
      (tp, n, lam, es, es2, snapD(lam * es),
        snapD(lam * es * es / (2.0 * (1.0 - lam * es))),
        snapD(lam * es2 / (2.0 * (1.0 - lam * es))),
        snapD(es2 / (es * es)))
    }
    val got = SparkEntry.queries("q494_pollaczek")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8))).toSeq
    assert(got == expected, s"got ${got.head} expected ${expected.head}")
    // M/D/1 never waits longer than M/G/1 at the same load
    got.foreach(r => assert(r._7 <= r._8 + 1e-12))
  }

  test("q495 randomized response equals the driver mechanism replay") {
    val modal = events.groupBy(_._2).map { case (u, xs) =>
      u -> xs.groupBy(_._3).toSeq
        .minBy { case (tp, g) => (-g.length, tp) }._1
    }
    val cats = events.map(_._3).distinct.sorted
    val k = cats.length.toLong
    val n = modal.size.toLong
    val reported = modal.toSeq.map { case (u, tc) =>
      if (md5i8(s"rr:keep:$u") % 4 < 3) tc
      else cats((md5i8(s"rr:pick:$u") % k).toInt)
    }
    val expected: Seq[(String, Long, Long, Double, Double, Double, Double)] = cats.toSeq.map { c =>
      val nt = modal.values.count(_ == c).toLong
      val no = reported.count(_ == c).toLong
      val obs = no.toDouble / n
      (c, nt, no, snapD(nt.toDouble / n), snapD(obs),
        snapD((obs - (1.0 - 0.75) / k) / 0.75),
        snapD((obs - (1.0 - 0.75) / k) / 0.75 - nt.toDouble / n))
    }
    val got = SparkEntry.queries("q495_randomized_response")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"got ${got.take(2)} expected ${expected.take(2)}")
  }

  test("q496 ring balance equals the driver successor replay") {
    val users = events.map(_._2).distinct
    val khash = users.map(u => md5i12(s"key:$u"))
    val expected = Seq(1L, 8L, 64L).map { v =>
      val ring = (for (node <- 0 until 16; j <- 0 until v.toInt)
        yield (node.toLong, md5i12(s"vn:$v:$node:$j"))).toSeq
      val minPos = ring.minBy(_._2)
      def owner(h: Long): Long =
        ring.filter(_._2 >= h).sortBy(_._2).headOption.getOrElse(minPos)._1
      val counts = khash.groupBy(owner).map { case (nd, xs) => nd -> xs.length.toLong }
      val tot = khash.length.toLong
      (v, tot, counts.size.toLong,
        snapD(counts.values.max.toDouble / tot),
        snapD(counts.values.min.toDouble / tot),
        snapD(counts.values.max.toDouble * 16.0 / tot))
    }
    val got = SparkEntry.queries("q496_hash_ring")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // true invariants (monotone imbalance in v is only a TENDENCY and
    // fails at tiny key counts): every key lands somewhere, the max
    // share is at least the uniform share, shares are consistent
    got.foreach { r =>
      assert(r._2 == khash.length.toLong)
      assert(r._6 >= 1.0 - 1e-9)
      assert(r._4 >= r._5)
    }
  }
}
