package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round16
import graft.sources.Tables

/** Differential checks for the round-16 corpus-dynamics audits:
  * driver-side brute-force references over the sf0.001 tables (explicit
  * loops, no SQL). q422's reference computes the pairwise-cosine mean
  * the O(n²) way, validating the closed form the query uses.
  */
class Round16PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  private def qiD(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private def numD(r: org.apache.spark.sql.Row, i: Int): Double = r.get(i) match {
    case d: java.math.BigDecimal => d.doubleValue
    case d: Double => d
    case x => sys.error(s"unexpected numeric ${x.getClass}")
  }

  private def closeTo(got: Double, want: Double, tol: Double = 1e-9): Boolean =
    math.abs(got - want) <= tol * math.max(1.0, math.max(math.abs(got), math.abs(want)))

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private lazy val vecs: Array[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))

  private def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+", -1).filter(_.nonEmpty)

  // ---------------------------------------------------------------- q421

  test("q421 novelty curve == driver first-seen reference; batch0 = 1.0") {
    val n = docs.map(_._1).max + 1
    val batchGrams = docs.flatMap { case (id, text, _, _) =>
      val b = math.floor(id * 10.0 / n).toInt
      words(text).sliding(3).filter(_.length == 3).map(g => (b, g.mkString(" ")))
    }.distinct
    val firstSeen = batchGrams.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1).min }
    val expect = batchGrams.groupBy(_._1).map { case (b, xs) =>
      val novel = xs.count { case (bb, g) => firstSeen(g) == bb }
      b -> (xs.length.toLong, novel.toLong, snapD(novel.toDouble / xs.length))
    }
    val got = Round16.q421NoveltyCurve.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (ng, nn, rate) = expect(r.getInt(0))
      assert(r.getLong(1) === ng && r.getLong(2) === nn, s"batch ${r.getInt(0)}")
      assert(closeTo(numD(r, 3), rate))
    }
    // the first batch is 100% novel by construction
    val b0 = got.find(_.getInt(0) == got.map(_.getInt(0)).min).get
    assert(numD(b0, 3) === 1.0)
  }

  // ---------------------------------------------------------------- q422

  test("q422 isotropy closed form == O(n^2) pairwise reference") {
    val qvecs = vecs.map { case (id, label, v) =>
      val nv = math.sqrt(v.map(x => qiD(x * x)).sum.toDouble / 1048576.0)
      (id, label, v.map(x => qiD(x / nv)))
    }
    val expect = qvecs.groupBy(_._2).map { case (label, vs) =>
      val n = vs.length
      var acc = 0.0
      for (i <- vs.indices; j <- vs.indices if i != j) {
        val (a, b) = (vs(i)._3, vs(j)._3)
        acc += a.indices.map(d => a(d).toDouble * b(d)).sum / (1048576.0 * 1048576.0)
      }
      label -> (n.toLong, acc / (n.toDouble * (n - 1)))
    }
    val got = Round16.q422Isotropy.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, mpc) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      // closed form vs brute accumulation: agreement to float-fold slack
      assert(closeTo(numD(r, 2), mpc, 1e-6), s"label ${r.getInt(0)}: ${numD(r, 2)} vs $mpc")
      assert(numD(r, 2) >= -1.0 - 1e-9 && numD(r, 2) <= 1.0 + 1e-9)
    }
  }

  // ---------------------------------------------------------------- q423

  test("q423 vocab duel == driver pricing reference; larger vocab never loses") {
    val all = docs.flatMap(d => words(d._2).map(w => (d._4, w)))
    val ranked = all.groupBy(_._2).map { case (w, xs) => (w, xs.length.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    def cost(w: String, cut: Long): Long =
      if (ranked(w) <= cut) 1L else math.ceil(w.length / 4.0).toLong
    val expect = all.groupBy(_._1).map { case (src, xs) =>
      val nW = xs.length.toLong
      val c64 = xs.map(x => cost(x._2, 64)).sum
      val c256 = xs.map(x => cost(x._2, 256)).sum
      src -> (nW, c64, c256, snapD(c64.toDouble / nW), snapD(c256.toDouble / nW),
        snapD(1.0 - c256.toDouble / c64))
    }
    val got = Round16.q423VocabDuel.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nW, c64, c256, f64, f256, win) = expect(r.getString(0))
      assert(r.getLong(1) === nW && r.getLong(2) === c64 && r.getLong(3) === c256)
      assert(closeTo(numD(r, 4), f64) && closeTo(numD(r, 5), f256) && closeTo(numD(r, 6), win))
      // a superset vocab can only reduce token cost
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  // ---------------------------------------------------------------- q424

  test("q424 mixture gap == driver reference; shares and gaps consistent") {
    val tokBySrc = docs.groupBy(_._4).map { case (src, ds) =>
      src -> ds.map(d => "[a-z]+".r.findAllIn(d._2.toLowerCase).length.toLong).sum
    }
    val n = tokBySrc.values.sum
    val k = tokBySrc.size
    val got = Round16.q424MixtureGap.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === tokBySrc.keySet)
    got.foreach { r =>
      val src = r.getString(0)
      val tok = tokBySrc(src)
      val share = snapD(tok.toDouble / n)
      assert(r.getLong(1) === tok)
      assert(closeTo(numD(r, 2), share))
      assert(closeTo(numD(r, 3), snapD(1.0 / k)))
      assert(closeTo(numD(r, 4), snapD(tok.toDouble / n - 1.0 / k)))
      assert(closeTo(numD(r, 5),
        snapD((1.0 / k) * math.log((1.0 / k) / (tok.toDouble / n)))))
      assert(r.getString(6) === (if (tok * k > n) "over" else "under"))
    }
    // raw shares sum to 1 within snap slack
    assert(math.abs(got.map(numD(_, 2)).sum - 1.0) < 1e-6)
  }

  // ---------------------------------------------------------------- q425

  test("q425 curriculum == driver schedule reference; phases ordered") {
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bySrc = docs.groupBy(_._4).map { case (src, ds) =>
      val dup = snapD(1.0 - ds.map(d => md5(d._2)).distinct.length.toDouble / ds.length)
      val tok = ds.map(d => "[a-z]+".r.findAllIn(d._2.toLowerCase).length.toLong).sum
      (src, dup, tok)
    }.toSeq.sortBy { case (src, dup, _) => (dup, src) }
    val total = bySrc.map(_._3).sum
    var cum = 0L
    val expect = bySrc.zipWithIndex.map { case ((src, dup, tok), i) =>
      val before = cum
      cum += tok
      val phase =
        if (before * 3 < total) "early"
        else if (before * 3 < total * 2) "mid"
        else "late"
      src -> ((i + 1).toLong, tok, dup, before, phase)
    }.toMap
    val got = Round16.q425Curriculum.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (ord, tok, dup, before, phase) = expect(r.getString(0))
      assert(r.getLong(1) === ord && r.getLong(2) === tok && r.getLong(4) === before)
      assert(closeTo(numD(r, 3), dup))
      assert(r.getString(5) === phase, s"${r.getString(0)} phase")
    }
    // phases appear in order along ord
    val phases = got.sortBy(_.getLong(1)).map(_.getString(5)).toSeq
    val idx = Map("early" -> 0, "mid" -> 1, "late" -> 2)
    assert(phases.map(idx) === phases.map(idx).sorted)
  }
}
