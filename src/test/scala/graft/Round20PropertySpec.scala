package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round20
import graft.sources.Tables

/** Differential checks for the round-20 embedding/transfer audits:
  * driver-side brute-force references over the sf0.001 tables (explicit
  * loops, no SQL).
  */
class Round20PropertySpec extends AnyFunSuite {

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

  /** Per-label centroids exactly as the SQL computes them. */
  private lazy val centroids: Map[Int, Array[Double]] =
    vecs.groupBy(_._2).map { case (label, vs) =>
      val dims = vs.head._3.length
      label -> Array.tabulate(dims) { d =>
        snapD(vs.map(v => qiD(v._3(d))).sum.toDouble / (1048576.0 * vs.length))
      }
    }

  private def cosRange(v: Array[Double], m: Array[Double], until: Int): Double = {
    val idx = 0 until until
    val dotq = idx.map(i => qiD(v(i) * m(i))).sum
    val vq = idx.map(i => qiD(v(i) * v(i))).sum
    val mq = idx.map(i => qiD(m(i) * m(i))).sum
    snapD(dotq / math.sqrt(vq.toDouble * mq))
  }

  private def bestCand(v: Array[Double], until: Int): Int =
    centroids.toSeq.map { case (cand, m) => (cand, cosRange(v, m, until)) }
      .sortBy { case (c, s) => (-s, c) }.head._1

  // ---------------------------------------------------------------- q441

  test("q441 matryoshka audit == driver truncation reference") {
    val expect = vecs.groupBy(_._2).map { case (label, vs) =>
      val rows = vs.map { v =>
        val full = bestCand(v._3, 64)
        val trunc = bestCand(v._3, 16)
        (full == trunc, full == label)
      }
      label -> (vs.length.toLong, rows.count(_._1).toLong,
        snapD(rows.count(_._1).toDouble / vs.length),
        snapD(rows.count(_._2).toDouble / vs.length))
    }
    val got = Round20.q441MatryoshkaAudit.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, agree, rate, self) = expect(r.getInt(0))
      assert(r.getLong(1) === n && r.getLong(2) === agree, s"label ${r.getInt(0)}")
      assert(closeTo(numD(r, 3), rate) && closeTo(numD(r, 4), self))
      assert(numD(r, 3) >= 0.0 && numD(r, 3) <= 1.0)
    }
  }

  // ---------------------------------------------------------------- q442

  test("q442 silhouette-lite == driver margin reference") {
    val expect = vecs.groupBy(_._2).map { case (label, vs) =>
      val rows = vs.map { v =>
        val own = cosRange(v._3, centroids(label), 64)
        val other = centroids.collect { case (c, m) if c != label =>
          cosRange(v._3, m, 64)
        }.max
        (own, other)
      }
      val n = vs.length
      label -> (n.toLong,
        snapD(rows.map(_._1).sum / n),
        snapD(rows.map(_._2).sum / n),
        snapD(rows.map(t => t._1 - t._2).sum / n),
        rows.count(t => t._1 > t._2).toLong)
    }
    val got = Round20.q442SilhouetteLite.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, own, other, margin, sep) = expect(r.getInt(0))
      assert(r.getLong(1) === n, s"label ${r.getInt(0)}")
      assert(closeTo(numD(r, 2), own) && closeTo(numD(r, 3), other))
      assert(closeTo(numD(r, 4), margin))
      assert(r.getLong(5) === sep)
    }
  }

  // ---------------------------------------------------------------- q443

  test("q443 pair cosine histogram == driver pairing reference; counts conserve") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val n = vecs.length.toLong
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val bins = vecs.map { case (id, _, v) =>
      val h = java.lang.Long.parseLong(md5hex(s"$id:pair").take(8), 16)
      val partner = (id + 1 + h % (n - 1)) % n
      val b = byId(partner)
      val dotq = v.indices.map(i => qiD(v(i) * b(i))).sum
      val aq = v.indices.map(i => qiD(v(i) * v(i))).sum
      val bq = v.indices.map(i => qiD(b(i) * b(i))).sum
      math.floor(snapD(dotq / math.sqrt(aq.toDouble * bq)) / 0.2).toLong
    }
    val expect = bins.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val got = Round20.q443PairCosineHist.fn(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet === expect.keySet)
    got.foreach { r =>
      assert(r.getLong(2) === expect(r.getLong(0)), s"bin ${r.getLong(0)}")
      assert(closeTo(numD(r, 1), snapD(r.getLong(0) * 0.2)))
    }
    assert(got.map(_.getLong(2)).sum === n)
  }

  // ---------------------------------------------------------------- q444

  test("q444 spearman == driver rank reference; rho in [-1,1]") {
    val pat = java.util.regex.Pattern.compile("[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]")
    val stats = docs.groupBy(_._4).map { case (src, ds) =>
      val ws = ds.flatMap(d => words(d._2))
      val t = ws.length.toLong
      val hq = ws.groupBy(identity).map { case (_, xs) =>
        val p = xs.length.toDouble / t; qiD(-p * math.log(p))
      }.sum
      val nt = ds.map { d =>
        val m = pat.matcher(d._2.toLowerCase); var c = 0L; while (m.find()) c += 1; c
      }.sum
      val nw = ds.map(d => words(d._2).length.toLong).sum
      (src, hq / 1048576.0, snapD(nt.toDouble / nw))
    }.toSeq
    val rh = stats.sortBy(s => (s._2, s._1)).zipWithIndex
      .map { case (s, i) => s._1 -> (i + 1L) }.toMap
    val rf = stats.sortBy(s => (s._3, s._1)).zipWithIndex
      .map { case (s, i) => s._1 -> (i + 1L) }.toMap
    val k = stats.length.toLong
    val d2 = stats.map(s => { val d = rh(s._1) - rf(s._1); d * d }).sum
    val rho = snapD(1.0 - 6.0 * d2 / (k * (k.toDouble * k - 1)))
    val got = Round20.q444SpearmanHealth.fn(spark, sfDir).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === k && got(0).getLong(1) === d2)
    assert(closeTo(numD(got(0), 2), rho))
    assert(numD(got(0), 2) >= -1.0 - 1e-9 && numD(got(0), 2) <= 1.0 + 1e-9)
  }

  // ---------------------------------------------------------------- q445

  test("q445 holdout transfer == driver held-out LM reference") {
    val bis = docs.flatMap { case (_, text, _, src) =>
      words(text).sliding(2).filter(_.length == 2).map(p => (src, p(0), p(1)))
    }
    val cbs = bis.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val cb = bis.groupBy(b => (b._2, b._3)).map { case (k, xs) => k -> xs.length.toLong }
    val cus = bis.groupBy(b => (b._1, b._2)).map { case (k, xs) => k -> xs.length.toLong }
    val cu = bis.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val v = bis.map(_._3).distinct.length.toLong
    val expect = cbs.groupBy(_._1._1).map { case (src, entries) =>
      val nBi = entries.values.sum
      val lq = entries.map { case ((s, a, b), c) =>
        val cOther = cb((a, b)) - c
        val cuOther = cu(a) - cus((s, a))
        c * math.floor(-math.log((cOther + 1.0) / (cuOther + v)) * 1048576.0 + 0.5).toLong
      }.sum
      src -> (nBi, snapD(lq.toDouble / (1048576.0 * nBi)))
    }
    val got = Round20.q445HoldoutTransfer.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nBi, h) = expect(r.getString(0))
      assert(r.getLong(1) === nBi, r.getString(0))
      assert(closeTo(numD(r, 2), h), s"${r.getString(0)} h_holdout")
      // held-out cross-entropy is positive and finite
      assert(numD(r, 2) > 0.0 && !numD(r, 2).isInfinite)
    }
  }
}
