package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-37 differential sweeps — driver references for the successive
  * halving schedule and the Markov projection.
  */
class Round37PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong
  private def md5i8(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private lazy val events = graft.sources.Tables.events(spark, sfDir)
    .selectExpr("CAST(unix_micros(ts) AS BIGINT) us", "event_id", "user_id",
      "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q497 halving schedule equals the driver replay") {
    val pulls = events
      .map(e => (md5i8(s"arm:${e._3}") % 16, e._1, e._2, math.round(e._5 * 100)))
      .groupBy(_._1).map { case (arm, xs) =>
        arm -> xs.sortBy(x => (x._2, x._3)).map(_._4)
      }
    def meanAt(arm: Long, b: Int): Double = {
      val taken = pulls(arm).take(b)
      snapD(taken.sum.toDouble / taken.length / 100.0)
    }
    var survivors = pulls.keys.toSeq.sorted
    val expected = (1 to 4).map { k =>
      val b = 4 * (1 << (k - 1))
      val keep = Seq(8, 4, 2, 1)(k - 1)
      val ranked = survivors.map(a => (a, meanAt(a, b)))
        .sortBy { case (a, m) => (-m, a) }
      survivors = ranked.take(keep).map(_._1)
      val means = survivors.map(meanAt(_, b))
      (k.toLong, b.toLong, survivors.length.toLong,
        snapD(means.min), snapD(means.max))
    }
    val got = SparkEntry.queries("q497_successive_halving")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q498 projection equals the driver matrix-power fold") {
    val byUser = events.groupBy(_._3).map { case (u, xs) =>
      u -> xs.sortBy(x => (x._1, x._2)).map(_._4)
    }
    val states = events.map(_._4).distinct.sorted
    val tc = scala.collection.mutable.Map.empty[(String, String), Long]
    byUser.values.foreach(seq => seq.sliding(2).filter(_.length == 2)
      .foreach(p => tc((p(0), p(1))) = tc.getOrElse((p(0), p(1)), 0L) + 1))
    val rowTot = tc.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val p = tc.map { case ((f, t), c) => (f, t) -> snapD(c.toDouble / rowTot(f)) }
    val nUsers = byUser.size.toLong
    var pi = states.map(st =>
      st -> snapD(byUser.values.count(_.head == st).toDouble / nUsers)).toMap
    val trail = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    // pi0 is a GROUP BY over observed first events — zero-mass states
    // have no row at step 0 (they appear from step 1 via the pmat join)
    states.filter(st => byUser.values.exists(_.head == st))
      .foreach(st => trail += ((0L, st, snapD(pi(st)))))
    for (k <- 1 to 4) {
      pi = states.map { to =>
        val terms = states.flatMap { from =>
          p.get((from, to)).map(pr => qiL(pi(from) * pr))
        }
        to -> snapD(terms.sum.toDouble / 1048576.0)
      }.toMap
      // only states reachable as a to_state appear in pmat rows;
      // states with zero mass still emit via the pmat join semantics
      states.foreach { st =>
        if (p.keys.exists(_._2 == st) || k == 0)
          trail += ((k.toLong, st, snapD(pi(st))))
      }
    }
    val got = SparkEntry.queries("q498_markov_projection")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = trail.toSeq.sortBy(t => (t._1, t._2))
    assert(got == expected, s"got ${got.take(6)} expected ${expected.take(6)}")
    // each projected step is (nearly) a distribution: mass within a few
    // quantization ulps of 1
    got.groupBy(_._1).values.foreach { xs =>
      assert(math.abs(xs.map(_._3).sum - 1.0) < 1e-4)
    }
  }
}
