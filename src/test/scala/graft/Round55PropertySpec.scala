package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-55 differential sweeps — driver references for Cronbach's alpha,
  * Fleiss' kappa and the Spearman–Brown split-half reliability.
  * Independent Scala recomputation from collected rows, replicating the
  * SQL's operation order bit-exactly.
  */
class Round55PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  /** (day, event_type) rows. */
  private def dayType: Array[(Long, String)] =
    graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us", "event_type").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L), r.getString(1)))

  /** Zero-filled per-(type, day) count matrix over the full day span. */
  private def matrix: (Seq[String], IndexedSeq[Long], Map[(String, Long), Long]) = {
    val dt = dayType
    val types = dt.map(_._2).distinct.sorted.toSeq
    val days = dt.map(_._1).min to dt.map(_._1).max
    val cnt = dt.groupBy(identity).map { case (k, xs) => k.swap -> xs.length.toLong }
    (types, days, cnt)
  }

  // ---------------------------------------------------------------- q582

  test("q582 Cronbach's alpha equals the exact-moment fold") {
    val (types, days, cnt) = matrix
    val n = days.length.toLong
    val k = types.length.toLong
    val itemNum = types.map { t =>
      val xs = days.map(d => cnt.getOrElse((t, d), 0L))
      n * xs.map(x => x * x).sum - xs.sum * xs.sum
    }.sum
    val totals = days.map(d => types.map(t => cnt.getOrElse((t, d), 0L)).sum)
    val totNum = n * totals.map(t => t * t).sum - totals.sum * totals.sum
    val share = itemNum.toDouble / totNum
    val alpha = k.toDouble / (k - 1) * (1 - itemNum.toDouble / totNum)
    val expected = (k.toInt, n, snapD(share), snapD(alpha), if (alpha > 0.7) 1 else 0)
    val got = SparkEntry.queries("q582_cronbach")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).head
    assert(got == expected, s"got $got expected $expected")
    // alpha never exceeds 1; the share and alpha move inversely
    assert(got._4 <= 1.0 + 1e-9)
  }

  // ---------------------------------------------------------------- q583

  test("q583 Fleiss' kappa equals the vote-count fold") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("text").collect().map(_.getString(0))
    val ss = docs.map { t =>
      val words = t.split(" ", -1)
      val r1 = if (t.length >= 200) 1L else 0L
      val r2 = if (words.length >= 40) 1L else 0L
      val r3 = if (2L * words.distinct.length >= words.length) 1L else 0L
      r1 + r2 + r3
    }
    val nDocs = ss.length.toLong
    val votes = ss.sum
    val agreeNum = ss.map(s => s * s + (3 - s) * (3 - s) - 3).sum
    val pBar = agreeNum.toDouble / (6 * nDocs)
    val p1 = votes.toDouble / (3 * nDocs)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    val expected = (nDocs, 3, snapD(p1), snapD(pBar), snapD(pe),
      snapD((pBar - pe) / (1 - pe)))
    val got = SparkEntry.queries("q583_fleiss_kappa")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).head
    assert(got == expected, s"got $got expected $expected")
    // observed agreement is a probability; kappa is bounded above by 1
    assert(got._4 >= 0.0 && got._4 <= 1.0 + 1e-9 && got._6 <= 1.0 + 1e-9)
  }

  // ---------------------------------------------------------------- q584

  test("q584 split-half reliability equals the halves fold") {
    val (types, days, cnt) = matrix
    val oddTypes = types.zipWithIndex.filter(_._2 % 2 == 0).map(_._1) // ranks 1,3,5
    val evenTypes = types.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)
    val as = days.map(d => oddTypes.map(t => cnt.getOrElse((t, d), 0L)).sum)
    val bs = days.map(d => evenTypes.map(t => cnt.getOrElse((t, d), 0L)).sum)
    val n = days.length.toLong
    val sa = as.sum; val sb = bs.sum
    val saa = as.map(x => x * x).sum
    val sbb = bs.map(x => x * x).sum
    val sab = as.zip(bs).map { case (x, y) => x * y }.sum
    val r = (n * sab - sa * sb).toDouble /
      math.sqrt((n * saa - sa * sa).toDouble) / math.sqrt((n * sbb - sb * sb).toDouble)
    val expected = (n, snapD(r), snapD(2 * r / (1 + r)))
    val got = SparkEntry.queries("q584_split_half")(spark, sfDir)
      .collect().map(r0 => (r0.getLong(0), r0.getDouble(1), r0.getDouble(2))).head
    assert(got == expected, s"got $got expected $expected")
    // Spearman-Brown steps the halves correlation TOWARD 1 when r > 0
    assert(got._2 > 0 ==> (got._3 >= got._2 - 1e-12))
  }

  private implicit class Implies(private val p: Boolean) {
    def ==>(q: => Boolean): Boolean = !p || q
  }
}
