package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round18
import graft.sources.Tables

/** Differential checks for the round-18 selection/structure audits:
  * driver-side brute-force references over the sf0.001 tables (explicit
  * loops, no SQL).
  */
class Round18PropertySpec extends AnyFunSuite {

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

  private def closeTo(got: Double, want: Double): Boolean =
    math.abs(got - want) <= 1e-9 * math.max(1.0, math.max(math.abs(got), math.abs(want)))

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

  // ---------------------------------------------------------------- q431

  test("q431 k-center coreset == driver farthest-first reference") {
    def d2q(a: Array[Double], b: Array[Double]): Long =
      a.indices.map(i => qiD((a(i) - b(i)) * (a(i) - b(i)))).sum
    val byId = vecs.map(v => v._1 -> v).toMap
    var centers = Vector(vecs.map(_._1).min)
    var dAtSel = Vector(0L)
    for (_ <- 2 to 4) {
      val cand = vecs.map { v =>
        val dmin = centers.map(c => d2q(v._3, byId(c)._3)).min
        (v._1, dmin)
      }
      val next = cand.minBy { case (id, d) => (-d, id) }
      centers :+= next._1
      dAtSel :+= next._2
    }
    val got = Round18.q431KcenterCoreset.fn(spark, sfDir).collect()
    assert(got.length === 4)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i + 1)
      assert(r.getLong(1) === centers(i), s"center ${i + 1}")
      assert(r.getInt(2) === byId(centers(i))._2)
      assert(closeTo(numD(r, 3), snapD(dAtSel(i).toDouble / 1048576.0)))
    }
    // farthest-first: selection distances are non-increasing after round 2
    val ds = got.drop(1).map(numD(_, 3))
    ds.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9); case _ => }
  }

  // ---------------------------------------------------------------- q432

  test("q432 doc stitching == driver affix reference") {
    val toks = docs.map(d => d._1 -> words(d._2)).filter(_._2.length >= 3)
    val heads = toks.map { case (id, ws) => id -> ws.take(3).mkString(" ") }
    val tails = toks.map { case (id, ws) => id -> ws.takeRight(3).mkString(" ") }
    val headsByAffix = heads.groupBy(_._2)
    val expect = (for {
      (tid, a) <- tails
      (hid, _) <- headsByAffix.getOrElse(a, Array.empty[(Long, String)])
      if hid != tid
    } yield (tid, hid, a)).sortBy(t => (t._1, t._2))
    val got = Round18.q432DocStitching.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty) // the synthetic corpus does contain stitch pairs
  }

  // ---------------------------------------------------------------- q433

  test("q433 Cramér's V == driver chi-square reference; V in [0,1]") {
    val cells = docs.groupBy(d => (d._3, d._4)).map { case (k, xs) => k -> xs.length.toLong }
    val ml = cells.groupBy(_._1._1).map { case (l, xs) => l -> xs.values.sum }
    val ms = cells.groupBy(_._1._2).map { case (s, xs) => s -> xs.values.sum }
    val n = docs.length.toLong
    // the SQL folds ALL cells of the cross product? no — only observed
    // cells (cell CTE has only o>0 rows); chi2 over observed cells only
    val chiQ = cells.map { case ((l, s), o) =>
      val e = ml(l).toDouble * ms(s) / n
      qiD((o - e) * (o - e) / e)
    }.sum
    val chi2 = snapD(chiQ / 1048576.0)
    val r = ml.size.toLong; val c = ms.size.toLong
    val v = snapD(math.sqrt(chiQ / 1048576.0 / (n * (math.min(r, c) - 1.0))))
    val got = Round18.q433CramersV.fn(spark, sfDir).collect()
    assert(got.length === 1)
    assert(closeTo(numD(got(0), 0), chi2))
    assert(got(0).getLong(1) === (r - 1) * (c - 1))
    assert(closeTo(numD(got(0), 2), v))
    assert(numD(got(0), 2) >= 0.0 && numD(got(0), 2) <= 1.0 + 1e-9)
  }

  // ---------------------------------------------------------------- q434

  test("q434 entropy rate == driver reference; conditioning reduces entropy") {
    def entropy(counts: Iterable[Long]): Double = {
      val t = counts.sum
      counts.map { ct =>
        val p = ct.toDouble / t; qiD(-p * math.log(p))
      }.sum / 1048576.0
    }
    val expect = docs.groupBy(_._4).map { case (src, ds) =>
      val ws = ds.flatMap(d => words(d._2))
      val h1 = entropy(ws.groupBy(identity).map(_._2.length.toLong))
      val bgs = ds.flatMap(d => words(d._2).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      val h2 = entropy(bgs.groupBy(identity).map(_._2.length.toLong))
      src -> (snapD(h1), snapD(h2), snapD(h2 - h1), snapD(math.exp(h2 - h1)))
    }
    val got = Round18.q434EntropyRate.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (h1, h2, hc, ppl) = expect(r.getString(0))
      assert(closeTo(numD(r, 1), h1), s"${r.getString(0)} h1")
      assert(closeTo(numD(r, 2), h2), s"${r.getString(0)} h2")
      assert(closeTo(numD(r, 3), hc) && closeTo(numD(r, 4), ppl))
      // H(w2|w1) <= H(w1) (subadditivity) and >= 0
      assert(numD(r, 3) >= -1e-9 && numD(r, 3) <= numD(r, 1) + 1e-9)
    }
  }

  // ---------------------------------------------------------------- q435

  test("q435 positional bias == driver KL reference; KL >= 0") {
    val expect = docs.groupBy(_._4).map { case (src, ds) =>
      val all = ds.flatMap(d => words(d._2))
      val uni = all.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      val t = all.length.toLong
      val firsts = ds.flatMap(d => words(d._2).headOption)
        .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      val tf = firsts.values.sum
      val klq = firsts.map { case (w, f) =>
        val pf = f.toDouble / tf; val pa = uni(w).toDouble / t
        qiD(pf * math.log(pf / pa))
      }.sum
      val top = firsts.toSeq.sortBy { case (w, f) => (-f, w) }.head._1
      src -> (firsts.size.toLong, snapD(klq / 1048576.0), top)
    }
    val got = Round18.q435PositionalBias.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nf, kl, top) = expect(r.getString(0))
      assert(r.getLong(1) === nf)
      assert(closeTo(numD(r, 2), kl), s"${r.getString(0)} kl")
      assert(r.getString(3) === top)
      // KL can dip epsilon-negative only through quantization
      assert(numD(r, 2) >= -1e-3)
    }
  }
}
