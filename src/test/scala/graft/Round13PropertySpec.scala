package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round13
import graft.sources.Tables

/** Differential checks for the round-13 curation operators: driver-side
  * brute-force references over the sf0.001 documents corpus (explicit
  * loops, no SQL), so the relational formulations are validated against
  * independent math, not just cross-engine parity.
  */
class Round13PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

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

  private def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+", -1).filter(_.nonEmpty)

  // ---------------------------------------------------------------- q406

  test("q406 repeated substrings == driver anchor+extend reference") {
    // per doc: kept tokens with original posexplode positions
    val tok = docs.map { case (id, text, _, _) =>
      id -> text.toLowerCase.split("[^a-z]+", -1).zipWithIndex
        .filter(_._1.nonEmpty).map { case (w, p) => (p, w) }
    }
    val grams = tok.flatMap { case (id, ws) =>
      // grams over KEPT-token order (lead over pos ordering), pos = the
      // anchor token's original position
      ws.sliding(5).filter(_.length == 5).map { g =>
        (id, g.head._1, g.head._2, g.map(_._2).mkString(" "))
      }
    }
    val dupGrams = grams.groupBy(_._4).filter(_._2.map(_._1).distinct.length >= 2).keySet
    val anchors = grams.filter(g => dupGrams(g._4))
    val spans = anchors.groupBy(_._1).toSeq.flatMap { case (id, as) =>
      val sorted = as.sortBy(_._2)
      // islands over anchor rank vs pos
      sorted.zipWithIndex.groupBy { case (a, i) => a._2 - (i + 1) }.map { case (_, run) =>
        val rs = run.map(_._1)
        val phrase = rs.map(_._3).mkString(" ") + " " +
          rs.last._4.split(" ", 2)(1)
        (id, phrase, rs.length.toLong + 4)
      }
    }
    val expect = spans.groupBy(s => (s._2, s._3))
      .map { case ((ph, len), xs) => (ph, len, xs.size.toLong, xs.map(_._1).distinct.size.toLong) }
      .filter(_._4 >= 2)
      .toSeq.sortBy { case (ph, len, _, _) => (-len, ph) }.take(15)
    val got = Round13.q406RepeatedSubstring.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
    // every reported span really is ≥2-doc repeated and ≥5 tokens
    got.foreach { case (ph, len, _, nd) =>
      assert(nd >= 2 && len >= 5 && ph.split(" ").length.toLong === len)
    }
  }

  // ---------------------------------------------------------------- q407

  test("q407 tokenizer fertility == driver regex reference") {
    val pat = java.util.regex.Pattern.compile("[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]")
    val byKey = docs.groupBy(d => (d._3, d._4)).map { case (k, ds) =>
      val nw = ds.map(d => d._2.trim.split("\\s+", -1).length.toLong).sum
      val nt = ds.map { d =>
        val m = pat.matcher(d._2.toLowerCase); var c = 0L; while (m.find()) c += 1; c
      }.sum
      val nb = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
      val nc = ds.map(_._2.length.toLong).sum
      k -> (ds.length.toLong, nw, nt,
        snapD(nt.toDouble / nw), snapD(nb.toDouble / nt), snapD(nc.toDouble / nt))
    }
    val got = Round13.q407TokenizerFertility.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === byKey.keySet)
    got.foreach { r =>
      val (nd, nw, nt, fert, bpt, cpt) = byKey((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === nd && r.getLong(3) === nw && r.getLong(4) === nt)
      assert(closeTo(numD(r, 5), fert) && closeTo(numD(r, 6), bpt) && closeTo(numD(r, 7), cpt))
      // BPE-proxy fertility must be >= 1 token per word
      assert(numD(r, 5) >= 1.0 - 1e-9)
    }
  }

  // ---------------------------------------------------------------- q408

  test("q408 dedup cascade == driver staged reference; counts monotone") {
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = docs.map { case (id, text, _, _) =>
      val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ")
      val bow = norm.split(" ", -1).distinct.sorted.mkString(" ")
      (id, md5(text), md5(norm.trim), md5(bow))
    }
    val s1 = keyed.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val s2 = keyed.filter(k => s1(k._1)).groupBy(_._3).map(_._2.map(_._1).min).toSet
    val s3 = keyed.filter(k => s2(k._1)).groupBy(_._4).map(_._2.map(_._1).min).toSet
    val expect = Seq(
      (1, keyed.length.toLong - s1.size, s1.size.toLong),
      (2, s1.size.toLong - s2.size, s2.size.toLong),
      (3, s2.size.toLong - s3.size, s3.size.toLong))
    val got = Round13.q408DedupCascade.fn(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expect)
    // survivors decrease monotonically, removals non-negative
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.reverse.toSeq)
    assert(got.forall(_._2 >= 0))
  }

  // ---------------------------------------------------------------- q409

  test("q409 doremi weights == driver MW reference; weights sum to 1") {
    val all = docs.flatMap(d => words(d._2).map(w => (d._4, w)))
    val cw = all.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val n = all.length.toLong
    val li = cw.map { case (w, c) =>
      w -> math.floor(-math.log(c.toDouble / n) * 1048576.0 + 0.5).toLong
    }
    val hd = all.groupBy(_._1).map { case (src, xs) =>
      val cs = xs.groupBy(_._2).map { case (w, ys) => w -> ys.length.toLong }
      val s = cs.map { case (w, c) => c * li(w) }.sum
      src -> snapD(s.toDouble / (1048576.0 * cs.values.sum))
    }
    val k = hd.size
    var a: Map[String, Double] = hd.keys.map(_ -> snapD(1.0 / k)).toMap
    for (_ <- 0 until 5) {
      val mu = a.toSeq.sortBy(_._1).map { case (s, w) => snapD(w * hd(s)) }.sum
      val b = a.map { case (s, w) =>
        s -> snapD(w * math.exp(snapD(0.1 * (hd(s) - mu))))
      }
      val tot = b.values.sum
      a = b.map { case (s, w) => s -> snapD(w / tot) }
    }
    val got = Round13.q409DoremiWeights.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === hd.keySet)
    got.foreach { r =>
      val s = r.getString(0)
      assert(closeTo(numD(r, 1), hd(s)), s"$s h_nats")
      assert(closeTo(numD(r, 2), a(s)), s"$s weight")
    }
    assert(math.abs(got.map(numD(_, 2)).sum - 1.0) < 1e-6)
    // higher-loss domains must end with weight >= the uniform start
    val maxLoss = hd.maxBy(_._2)._1
    val gotW = got.map(r => r.getString(0) -> numD(r, 2)).toMap
    assert(gotW(maxLoss) >= 1.0 / k - 1e-9)
  }

  // ---------------------------------------------------------------- q410

  test("q410 perplexity terciles == driver bigram-LM reference") {
    val tokByDoc = docs.map(d => (d._1, d._3, words(d._2)))
    val bis = tokByDoc.flatMap { case (id, _, ws) =>
      ws.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val cu = bis.groupBy(_._2).map { case (a, xs) => a -> xs.length.toLong }
    val v = bis.map(_._3).distinct.length.toLong
    val cb = bis.groupBy(b => (b._2, b._3)).map { case (k, xs) => k -> xs.length.toLong }
    val lp = cb.map { case ((a, b), c) =>
      (a, b) -> math.floor(-math.log((c.toDouble + 1.0) / (cu(a) + v)) * 1048576.0 + 0.5).toLong
    }
    val score = bis.groupBy(_._1).map { case (id, xs) =>
      id -> snapD(xs.map(x => lp((x._2, x._3))).sum.toDouble / (1048576.0 * xs.length))
    }
    val langOf = tokByDoc.map(t => t._1 -> t._2).toMap
    val expect = score.toSeq.groupBy(s => langOf(s._1)).flatMap { case (lang, xs) =>
      val sorted = xs.sortBy { case (id, h) => (h, id) }
      val n = sorted.length
      sorted.zipWithIndex.map { case ((_, h), i) =>
        val cume = (i + 1).toDouble / n
        val bucket = if (cume <= 1.0 / 3) "head" else if (cume <= 2.0 / 3) "middle" else "tail"
        (lang, bucket, h)
      }
    }.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.size.toLong, snapD(xs.map(_._3).sum / xs.size))
    }
    val got = Round13.q410PerplexityFilter.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expect.keySet)
    got.foreach { r =>
      val (n, mh) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n, s"${r.getString(0)}/${r.getString(1)} count")
      assert(closeTo(numD(r, 3), mh), s"${r.getString(0)}/${r.getString(1)} mean_h")
    }
    // the tercile means must be ordered head <= middle <= tail per lang
    val byLang = got.groupBy(_.getString(0))
    byLang.values.foreach { rows =>
      val m = rows.map(r => r.getString(1) -> numD(r, 3)).toMap
      for (h <- m.get("head"); mid <- m.get("middle")) assert(h <= mid + 1e-9)
      for (mid <- m.get("middle"); t <- m.get("tail")) assert(mid <= t + 1e-9)
    }
  }
}
