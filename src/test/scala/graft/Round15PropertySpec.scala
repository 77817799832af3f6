package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round15
import graft.sources.Tables

/** Differential checks for the round-15 corpus-quality audits: driver-side
  * brute-force references over the sf0.001 tables (explicit loops, no SQL),
  * so the relational formulations are validated against independent math,
  * not just cross-engine parity.
  */
class Round15PropertySpec extends AnyFunSuite {

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

  /** Per-label centroids exactly as the SQL computes them: quantized
    * component sums, snapped means. Shared by q417/q418.
    */
  private lazy val centroids: Map[Int, Array[Double]] =
    vecs.groupBy(_._2).map { case (label, vs) =>
      val dims = vs.head._3.length
      label -> Array.tabulate(dims) { d =>
        snapD(vs.map(v => qiD(v._3(d))).sum.toDouble / (1048576.0 * vs.length))
      }
    }

  private def cosTo(v: Array[Double], m: Array[Double]): Double = {
    val dotq = v.indices.map(i => qiD(v(i) * m(i))).sum
    val vq = v.indices.map(i => qiD(v(i) * v(i))).sum
    val mq = m.indices.map(i => qiD(m(i) * m(i))).sum
    snapD(dotq / math.sqrt(vq.toDouble * mq))
  }

  // ---------------------------------------------------------------- q416

  test("q416 segment dedup == driver chunked reference; rates bounded") {
    val segs = docs.flatMap { case (id, text, _, src) =>
      words(text).grouped(16).zipWithIndex.map { case (g, i) =>
        (src, id, i.toLong, g.mkString(" "), g.length.toLong)
      }
    }
    val dupFlag = segs
      .groupBy(_._4).values.flatMap { xs =>
        xs.sortBy(s => (s._2, s._3)).zipWithIndex.map { case (s, i) => (s, i >= 1) }
      }.toSeq
    val expect = dupFlag.groupBy(_._1._1).map { case (src, xs) =>
      val nSeg = xs.size.toLong
      val nDup = xs.count(_._2).toLong
      val nTok = xs.map(_._1._5).sum
      val nDupTok = xs.filter(_._2).map(_._1._5).sum
      src -> (nSeg, nDup, nTok, nDupTok, snapD(nDupTok.toDouble / nTok))
    }
    val got = Round15.q416SegmentDedup.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nSeg, nDup, nTok, nDupTok, rate) = expect(r.getString(0))
      assert(r.getLong(1) === nSeg && r.getLong(2) === nDup, r.getString(0))
      assert(r.getLong(3) === nTok && r.getLong(4) === nDupTok, r.getString(0))
      assert(closeTo(numD(r, 5), rate))
      assert(numD(r, 5) >= 0.0 && numD(r, 5) <= 1.0)
    }
  }

  // ---------------------------------------------------------------- q417

  test("q417 prototypicality bands == driver centroid reference") {
    val byLabel = vecs.groupBy(_._2)
    val banded = byLabel.toSeq.flatMap { case (label, vs) =>
      val scored = vs.map(v => (v._1, cosTo(v._3, centroids(label))))
        .sortBy { case (id, c) => (c, id) }
      val n = scored.length
      scored.zipWithIndex.map { case ((_, c), i) =>
        val cume = (i + 1).toDouble / n
        val band =
          if (cume <= 0.1) "drop_outlier"
          else if (cume > 0.9) "drop_neardup"
          else "keep"
        (label, band, c)
      }
    }
    val expect = banded.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.size.toLong, snapD(xs.map(_._3).sum / xs.size),
        xs.map(_._3).min, xs.map(_._3).max)
    }
    val got = Round15.q417Prototypicality.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSet === expect.keySet)
    got.foreach { r =>
      val (n, mc, mn, mx) = expect((r.getInt(0), r.getString(1)))
      assert(r.getLong(2) === n, s"${r.getInt(0)}/${r.getString(1)} n")
      assert(closeTo(numD(r, 3), mc) && closeTo(numD(r, 4), mn) && closeTo(numD(r, 5), mx))
    }
    // keep band must hold ~80% of each label
    val keepN = got.filter(_.getString(1) == "keep").map(r => r.getInt(0) -> r.getLong(2)).toMap
    byLabel.foreach { case (label, vs) =>
      val total = vs.length
      assert(math.abs(keepN.getOrElse(label, 0L) - 0.8 * total) <= 2.0 + 0.01 * total)
    }
  }

  // ---------------------------------------------------------------- q418

  test("q418 label-noise confusion == driver nearest-centroid reference") {
    val preds = vecs.map { case (id, label, v) =>
      val best = centroids.toSeq
        .map { case (cand, m) => (cand, cosTo(v, m)) }
        .sortBy { case (cand, c) => (-c, cand) }
        .head
      (label, best._1, best._2)
    }
    val expect = preds.groupBy(p => (p._1, p._2)).map { case (k, xs) =>
      k -> (xs.size.toLong, snapD(xs.map(_._3).sum / xs.size))
    }
    val got = Round15.q418LabelNoise.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSet === expect.keySet)
    got.foreach { r =>
      val (n, mc) = expect((r.getInt(0), r.getInt(1)))
      assert(r.getLong(2) === n, s"${r.getInt(0)}->${r.getInt(1)} n")
      assert(closeTo(numD(r, 3), mc))
    }
    // confusion counts partition the vector set
    assert(got.map(_.getLong(2)).sum === vecs.length.toLong)
  }

  // ---------------------------------------------------------------- q419

  test("q419 zipf fit == driver least-squares reference; slope negative") {
    val expect = docs.groupBy(_._4).map { case (src, ds) =>
      val counts = ds.flatMap(d => words(d._2)).groupBy(identity)
        .map { case (w, xs) => (w, xs.length.toLong) }
        .toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
      val pts = counts.zipWithIndex.map { case ((_, c), i) =>
        val x = math.log((i + 1).toDouble); val y = math.log(c.toDouble)
        (qiD(x), qiD(y), qiD(x * y), qiD(x * x), qiD(y * y))
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum / 1048576.0
      val sy = pts.map(_._2).sum / 1048576.0
      val sxy = pts.map(_._3).sum / 1048576.0
      val sxx = pts.map(_._4).sum / 1048576.0
      val syy = pts.map(_._5).sum / 1048576.0
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r2den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      src -> (pts.length.toLong, snapD(slope), snapD((sy - slope * sx) / n),
        if (n * syy - sy * sy <= 0) None
        else Some(snapD((n * sxy - sx * sy) * (n * sxy - sx * sy) / r2den)))
    }
    val got = Round15.q419ZipfFit.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, slope, icpt, r2) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(closeTo(numD(r, 2), slope), s"${r.getString(0)} slope")
      assert(closeTo(numD(r, 3), icpt), s"${r.getString(0)} intercept")
      r2 match {
        case Some(v) => assert(closeTo(numD(r, 4), v), s"${r.getString(0)} r2")
        case None => assert(r.isNullAt(4))
      }
      // Zipfian text: slope strictly negative, r2 in [0, 1]
      assert(numD(r, 2) < 0.0)
      if (!r.isNullAt(4)) assert(numD(r, 4) >= 0.0 && numD(r, 4) <= 1.0 + 1e-9)
    }
  }

  // ---------------------------------------------------------------- q420

  test("q420 dataset card == driver reference") {
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = docs.groupBy(_._4).map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val toks = ds.map(d => (d._1, "[a-z]+".r.findAllIn(d._2.toLowerCase).length.toLong))
      val nTok = toks.map(_._2).sum
      val nUniq = ds.map(d => md5(d._2)).distinct.length.toLong
      val sorted = toks.sortBy { case (id, t) => (t, id) }
      val median = sorted(((nDocs + 1) / 2).toInt - 1)._2
      val langC = ds.groupBy(_._3).map(_._2.length.toLong)
      val entQ = langC.map { c =>
        val p = c.toDouble / nDocs; qiD(-p * math.log(p))
      }.sum
      src -> (nDocs, nTok, nUniq, snapD(1.0 - nUniq.toDouble / nDocs),
        snapD(nTok.toDouble / nDocs), median, snapD(entQ / 1048576.0))
    }
    val got = Round15.q420DatasetCard.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nd, nt, nu, dr, mt, med, ent) = expect(r.getString(0))
      assert(r.getLong(1) === nd && r.getLong(2) === nt && r.getLong(3) === nu)
      assert(closeTo(numD(r, 4), dr) && closeTo(numD(r, 5), mt))
      assert(r.getLong(6) === med, s"${r.getString(0)} median")
      assert(closeTo(numD(r, 7), ent), s"${r.getString(0)} entropy")
      // entropy bounded by ln(#langs)
      assert(numD(r, 7) >= -1e-9)
    }
  }
}
