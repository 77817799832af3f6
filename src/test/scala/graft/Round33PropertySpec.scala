package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-33 differential sweeps — driver references for the best-of-n
  * curve, the top-p vocabulary sheet, and the order-bias audit.
  */
class Round33PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q487 best-of-n equals the driver order-statistics fold") {
    def powN(v: Double, n: Int): Double = Seq.fill(n)(v).reduceLeft(_ * _)
    val bySource = docs.groupBy(_._2)
    val expected = bySource.toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val bins = ds.map(d => math.min(d._3.length / 64, 31).toLong)
      val t = bins.length
      val hist = bins.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
      val sorted = hist.toSeq.sortBy(_._1)
      val cums = sorted.scanLeft(0L)(_ + _._2).tail
      Seq(1, 4, 16).map { n =>
        val terms = sorted.zip(cums).map { case ((bin, c), cum) =>
          val fx = cum.toDouble / t
          val fprev = (cum - c).toDouble / t
          qiL(bin * (powN(fx, n) - powN(fprev, n)))
        }
        (src, n.toLong, snapD(terms.sum.toDouble / 1048576.0))
      }
    }
    val got = SparkEntry.queries("q487_best_of_n")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected, s"got ${got.take(4)} expected ${expected.take(4)}")
    // best-of-n is monotone in n per source
    got.groupBy(_._1).values.foreach { xs =>
      val ordered = xs.sortBy(_._2).map(_._3)
      assert(ordered == ordered.sorted)
    }
  }

  test("q488 top-p vocab equals the driver nucleus fold") {
    val bySource = docs.groupBy(_._2)
    val expected = bySource.toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val words = ds.flatMap(_._3.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      val tc = words.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      val ranked = tc.toSeq.sortBy { case (w, c) => (-c, w) }
      val t = ranked.map(_._2).sum
      val nTypes = ranked.length.toLong
      val cums = ranked.scanLeft(0L)(_ + _._2).tail
      Seq(50L, 90L, 95L).map { p =>
        val idx = cums.indexWhere(cum => 100 * cum >= p * t)
        val nVocab = (idx + 1).toLong
        (src, p, nVocab, nTypes,
          snapD(cums(idx).toDouble / t), snapD(nVocab.toDouble / nTypes))
      }
    }
    val got = SparkEntry.queries("q488_top_p_vocab")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got ${got.take(3)} expected ${expected.take(3)}")
  }

  test("q489 order bias equals the driver adjacency fold") {
    val seq = docs.sortBy(_._1).map(_._2)
    val n = seq.length.toLong
    val expected = seq.groupBy(identity).toSeq.sortBy(_._1).map { case (src, xs) =>
      val ni = xs.length.toLong
      val sameAdj = seq.sliding(2).count(p => p.length == 2 && p(0) == src && p(1) == src).toLong
      (src, ni, sameAdj,
        snapD(ni.toDouble * (ni - 1) / n),
        snapD(sameAdj.toDouble * n / (ni.toDouble * (ni - 1))))
    }
    val got = SparkEntry.queries("q489_order_bias")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got ${got.take(3)} expected ${expected.take(3)}")
  }
}
