package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-25 differential sweeps — driver-side exact references for
  * Self-BLEU's leave-one-out clipping, the watermark z-test, and the
  * template shape classes.
  */
class Round25PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  private def tokens(t: String): Array[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)

  private lazy val docs: Array[(Long, String, String)] = graft.sources.Tables
    .documents(spark, sfDir)
    .select("doc_id", "source", "text")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q466 self-BLEU equals a brute-force leave-one-out reference") {
    def gramCounts(t: String, n: Int): Map[String, Long] =
      tokens(t).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (g, xs) => g -> xs.length.toLong }
    // brute force: for each doc, max tf among ALL OTHER docs per gram
    def precisions(n: Int): Map[Long, Double] = {
      val perDoc = docs.map { case (id, _, t) => id -> gramCounts(t, n) }
      val withGrams = perDoc.filter(_._2.nonEmpty)
      withGrams.map { case (id, tf) =>
        val clipped = tf.map { case (g, c) =>
          val maxOther = withGrams.iterator
            .filter(_._1 != id)
            .map(_._2.getOrElse(g, 0L))
            .max
          math.min(c, maxOther)
        }.sum
        id -> snapD(clipped.toDouble / tf.values.sum)
      }.toMap
    }
    val (p1, p2) = (precisions(1), precisions(2))
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val expected = p2.keys.toSeq // docs with >= 2 tokens
      .map(id => (srcOf(id), p1(id), p2(id), snapD(math.sqrt(p1(id) * p2(id)))))
      .groupBy(_._1)
      .map { case (src, xs) =>
        src -> (xs.length.toLong,
          snapD(xs.map(_._2).sum / xs.length),
          snapD(xs.map(_._3).sum / xs.length),
          snapD(xs.map(_._4).sum / xs.length))
      }
    val got = SparkEntry.queries("q466_self_bleu")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: got ${got(src)} expected $e")
    }
  }

  test("q467 watermark z equals the md5 green-list driver reference") {
    def green(a: String, b: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a|$b".getBytes("UTF-8"))
      // lowest hex digit = low nibble of the last byte
      (d(15) & 0x0f).toLong % 2
    }
    val expected = docs
      .map { case (id, src, t) =>
        val w = tokens(t)
        val trans = w.sliding(2).filter(_.length == 2).toArray
        val n = trans.length.toLong
        val g = trans.map(p => green(p(0), p(1))).sum
        (src, n, g)
      }
      .filter(_._2 > 0)
      .map { case (src, n, g) => (src, snapD((2.0 * g - n) / math.sqrt(n.toDouble))) }
      .groupBy(_._1)
      .map { case (src, xs) =>
        src -> (xs.length.toLong, snapD(xs.map(_._2).sum / xs.length),
          xs.count(_._2 >= 2.0).toLong)
      }
    val got = SparkEntry.queries("q467_watermark_detect")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: got ${got(src)} expected $e")
    }
  }

  test("q468 template classes equal the shape-hash driver reference") {
    val segs = docs.flatMap { case (id, src, t) =>
      tokens(t).grouped(16).filter(_.length == 16).zipWithIndex.map {
        case (w, i) =>
          (id, src, i,
            w.map(_.length.toString).mkString(","),
            w.mkString(","))
      }
    }
    val expected = segs
      .groupBy(_._4)
      .map { case (shape, xs) =>
        shape -> (xs.length.toLong, xs.map(_._1).distinct.length.toLong,
          xs.map(_._2).distinct.length.toLong,
          xs.map(_._5).distinct.length.toLong, xs.map(_._1).min)
      }
      .filter(_._2._1 >= 2L)
    val got = SparkEntry.queries("q468_template_mining")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // got is the top-25 by (n_segments DESC, tpl); every returned class
    // must exactly match the reference (keyed by md5 of the shape string)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expByMd5 = expected.map { case (shape, v) => md5hex(shape) -> v }
    assert(got.nonEmpty)
    got.foreach { case (tpl, nSeg, nDocs, nSrc, nTexts, ex) =>
      val e = expByMd5.get(tpl)
      assert(e.isDefined, s"unknown template class $tpl")
      assert(e.get == ((nSeg, nDocs, nSrc, nTexts, ex)),
        s"class $tpl: got ($nSeg,$nDocs,$nSrc,$nTexts,$ex) expected ${e.get}")
    }
    assert(got.length == math.min(25, expByMd5.size))
  }
}
