package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-23 differential sweeps: driver-side references for the
  * blocklist automaton, TextRank, Burrows' Delta and gram coverage —
  * the engine-independent net that catches generated-SQL bugs the
  * two-engine hash gate structurally cannot (both engines replay the
  * same SQL text).
  */
class Round23PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q456 blocklist counts equal a per-pattern contains() reference") {
    val docs = graft.sources.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = graft.queries.Round23.BlockPatterns.zipWithIndex.map {
      case (p, i) => (i.toLong, docs.count(_._2.contains(p)).toLong)
    }
    val got = SparkEntry
      .queries("q456_blocklist")(spark, sfDir)
      .select("pattern_id", "n_docs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq == expected)
    // the absent pattern must be present with a zero count (A4 zero-fill)
    assert(got.last == (9L, 0L))
  }

  test("q459 textrank equals a driver power-iteration reference") {
    val docs = graft.sources.Tables
      .documents(spark, sfDir)
      .select("text")
      .collect()
      .map(_.getString(0))
    def snapD(x: Double): Double =
      math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
    val bigrams = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { t =>
      val w = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      w.sliding(2).foreach {
        case Array(a, b) if a != b =>
          bigrams((a, b)) = bigrams.getOrElse((a, b), 0L) + 1L
        case _ => ()
      }
    }
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    bigrams.foreach { case ((a, b), w) =>
      edges((a, b)) = edges.getOrElse((a, b), 0L) + w
      edges((b, a)) = edges.getOrElse((b, a), 0L) + w
    }
    val wdeg = edges.toSeq.groupBy(_._1._1).map { case (v, es) => v -> es.map(_._2).sum }
    var pr: Map[String, Double] = wdeg.map { case (v, _) => v -> 1.0 }.toMap
    for (_ <- 0 until 3) {
      // per-target sums of snapped per-edge contributions, then the
      // damped update — the exact arithmetic of the unrolled SQL
      val in = scala.collection.mutable.Map.empty[String, Double]
      edges.foreach { case ((a, b), w) =>
        in(b) = in.getOrElse(b, 0.0) + snapD(pr(a) * w / wdeg(a))
      }
      pr = in.map { case (v, s) => v -> snapD(0.15 + 0.85 * s) }.toMap
    }
    val expected = pr.toSeq
      .sortBy { case (v, p) => (-p, v) }
      .take(12)
    val got = SparkEntry
      .queries("q459_textrank")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
  }

  test("q458 Burrows' Delta: distances are within [0, inf), pairs distinct and sorted") {
    val rows = SparkEntry
      .queries("q458_burrows_delta")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 10)
    assert(rows.forall { case (a, b, d) => a < b && d >= 0.0 })
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
  }

  test("q461 gram coverage equals driver set arithmetic for every n") {
    val docs = graft.sources.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def fold(id: Long): Long = {
      val d = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"$id:cov".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16) % 5
    }
    def grams(t: String, n: Int): Set[String] =
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val got = SparkEntry
      .queries("q461_gram_coverage")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    (1 to 3).foreach { n =>
      val test = docs.filter(d => fold(d._1) == 0).map(d => grams(d._2, n))
        .foldLeft(Set.empty[String])(_ ++ _)
      val train = docs.filter(d => fold(d._1) != 0).map(d => grams(d._2, n))
        .foldLeft(Set.empty[String])(_ ++ _)
      val row = got.find(_._1 == n.toLong).get
      assert(row == ((n.toLong, test.size.toLong, train.size.toLong,
        (test intersect train).size.toLong)),
        s"n=$n: got $row expected (${test.size}, ${train.size}, ${(test intersect train).size})")
    }
  }

  test("q460 JL distortion: bounded errors, sign agreement is a share") {
    val r = SparkEntry
      .queries("q460_jl_distortion")(spark, sfDir)
      .collect()(0)
    val (n, mean, mx, sgn) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(mean >= 0.0 && mean <= mx)
    assert(mx <= 2.0) // cosines live in [-1, 1]
    assert(sgn >= 0.0 && sgn <= 1.0)
    // a random 16-dim projection preserves SOME structure: the mean
    // cosine error must beat the trivial bound by a wide margin
    assert(mean < 0.5, s"JL projection lost all structure: mean err $mean")
  }

  test("q457 tiling: gap counts consistent, boundaries <= gaps, blocks = gaps + 1") {
    val rows = SparkEntry
      .queries("q457_text_tiling")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, blocks, gaps, bounds, mn, mean) =>
      assert(blocks == gaps + 1, s"doc $id")
      assert(bounds <= gaps, s"doc $id")
      assert(mn >= -1.0e-9 && mn <= 1.0 + 1e-9, s"doc $id min gap $mn")
      assert(mean >= mn - 1e-9, s"doc $id")
    }
  }
}
