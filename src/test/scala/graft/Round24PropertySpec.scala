package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-24 differential sweeps — driver-side references for pass@k,
  * CUPED's theta, sorted-neighborhood Jaccards and the MaxScore
  * essential-set rule.
  */
class Round24PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  test("q464 pass@k equals the exact binomial estimator (BigInt reference)") {
    val events = graft.sources.Tables
      .events(spark, sfDir)
      .select("user_id", "event_type")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byUser = events.groupBy(_._1).map { case (u, es) =>
      u -> (es.length.toLong, es.count(_._2 == "purchase").toLong)
    }.filter(_._2._1 >= 10)
    def binom(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0L until k).foldLeft(BigInt(1))((a, i) => a * BigInt(n - i) / BigInt(i + 1))
    def passAt(n: Long, c: Long, k: Long): Double =
      if (n - c < k) 1.0
      else 1.0 - (BigDecimal(binom(n - c, k)) / BigDecimal(binom(n, k))).toDouble
    val r = SparkEntry.queries("q464_pass_at_k")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == byUser.size.toLong)
    Seq((1L, r.getDouble(1)), (5L, r.getDouble(2)), (10L, r.getDouble(3))).foreach {
      case (k, got) =>
        val exact = byUser.values.map { case (n, c) => passAt(n, c, k) }.sum / byUser.size
        // engine computes the unrolled float product, reference the exact
        // rational — equal up to a few ulps plus the final 2^-30 snap
        assert(math.abs(got - exact) < 1e-6, s"k=$k: got $got exact $exact")
    }
  }

  test("q462 sorted-neighborhood: emitted Jaccards recompute exactly, sorted desc") {
    val docs = graft.sources.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    def grams(t: String): Set[String] =
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val rows = SparkEntry
      .queries("q462_sorted_neighborhood")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq)
    rows.foreach { case (a, b, j) =>
      val (ga, gb) = (grams(docs(a)), grams(docs(b)))
      val exact = snapD(ga.intersect(gb).size.toDouble / ga.union(gb).size)
      assert(j == exact, s"pair ($a,$b): got $j exact $exact")
    }
  }

  test("q465 CUPED: theta and means equal the closed-form driver reference") {
    val events = graft.sources.Tables
      .events(spark, sfDir)
      .selectExpr(
        "user_id",
        "CAST(datediff(to_date(ts), DATE '2024-01-01') AS BIGINT) AS dd",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = math.floor((events.map(_._2).min + events.map(_._2).max) / 2.0).toLong
    val u = events.groupBy(_._1).map { case (uid, es) =>
      (uid,
        es.filter(_._2 <= mid).map(_._3).sum,
        es.filter(_._2 > mid).map(_._3).sum)
    }.toSeq
    val n = u.size.toLong
    val (sx, sy) = (u.map(_._2).sum, u.map(_._3).sum)
    val sxy = u.map(t => t._2 * t._3).sum
    val sxx = u.map(t => t._2 * t._2).sum
    val cov = snapD((sxy.toDouble - sx.toDouble * sy / n) / n)
    val vx = snapD((sxx.toDouble - sx.toDouble * sx / n) / n)
    val theta = if (vx == 0) 0.0 else snapD(cov / vx)
    val rows = SparkEntry.queries("q465_cuped")(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getDouble(4) == theta, s"theta ${r.getDouble(4)} != $theta")
      val ratio = r.getDouble(5)
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9,
        s"CUPED must not increase variance: $ratio")
    }
    // arm means must average to the overall mean (weighted), sanity-level
    val totUsers = rows.map(_.getLong(1)).sum
    assert(totUsers == n)
  }

  test("q463 MaxScore: essential set is the ascending-UB suffix crossing theta") {
    val rows = SparkEntry
      .queries("q463_maxscore_prune")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6)))
    assert(rows.length == 8)
    val theta = rows.head._4
    val asc = rows.sortBy(r => (r._2, r._1))
    var cum = 0.0
    asc.foreach { case (term, ub, ess, _, _, _) =>
      cum = snapD(cum + ub)
      val expected = if (cum < theta) 0L else 1L
      assert(ess == expected, s"term $term: essential=$ess cum=$cum theta=$theta")
    }
    val share = rows.head._6
    assert(share >= 0.0 && share < 1.0)
    // at least one term must be essential (else the top-10 is unreachable)
    assert(rows.exists(_._3 == 1L))
  }
}
