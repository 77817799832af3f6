package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round21
import graft.sources.Tables

/** Differential checks for the round-21 curation-policy analytics:
  * driver-side brute-force references over the sf0.001 documents table
  * (explicit loops, no SQL).
  */
class Round21PropertySpec extends AnyFunSuite {

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

  private def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+", -1).filter(_.nonEmpty)

  /** (doc_id, source, seg_id, segText, nTok) 16-token segments. */
  private lazy val segs: Array[(Long, String, Long, String, Long)] =
    docs.flatMap { case (id, text, _, src) =>
      words(text).grouped(16).zipWithIndex.map { case (g, i) =>
        (id, src, i.toLong, g.mkString(" "), g.length.toLong)
      }
    }

  /** Per segment instance: duplicate flag by global (doc_id, seg_id)
    * first-occurrence order, plus class multiplicity/token mass.
    */
  private lazy val markedSegs: Seq[((Long, String, Long, String, Long), Boolean, Long, Long)] =
    segs.groupBy(_._4).values.flatMap { xs =>
      val sorted = xs.sortBy(s => (s._1, s._3))
      val mult = xs.length.toLong
      val classTok = xs.map(_._5).sum
      sorted.zipWithIndex.map { case (s, i) => (s, i >= 1, mult, classTok) }
    }.toSeq

  // ---------------------------------------------------------------- q446

  test("q446 dedup reweight == driver reference; mass fidelity is exactly 1") {
    val expect = markedSegs.filter(!_._2).groupBy(_._1._2).map { case (src, xs) =>
      val surv = xs.size.toLong
      val tok = xs.map(_._1._5).sum
      val rew = xs.map(t => t._3 * t._1._5).sum
      val orig = xs.map(_._4).sum
      src -> (surv, tok, rew, orig, snapD(rew.toDouble / orig))
    }
    val got = Round21.q446DedupReweight.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (surv, tok, rew, orig, fid) = expect(r.getString(0))
      assert(r.getLong(1) === surv && r.getLong(2) === tok, r.getString(0))
      assert(r.getLong(3) === rew && r.getLong(4) === orig)
      assert(closeTo(numD(r, 5), fid))
      // identical text implies identical token count, so reweighted mass
      // must reproduce the original class mass exactly
      assert(numD(r, 5) === 1.0, s"${r.getString(0)} fidelity")
    }
  }

  // ---------------------------------------------------------------- q447

  test("q447 filter ablation == driver bitmask reference; masks partition corpus") {
    val dupDocs = markedSegs.filter(_._2).map(_._1._1).toSet
    val expect = docs.map { case (id, text, _, _) =>
      val ws = words(text)
      val nw = ws.length.toLong
      val nv = ws.distinct.length.toLong
      val bits = (if (nw >= 150) 4 else 0) +
        (if (nv * 100 >= nw * 35) 2 else 0) +
        (if (!dupDocs(id)) 1 else 0)
      (bits, nw)
    }.groupBy(_._1).map { case (b, xs) => b -> (xs.length.toLong, xs.map(_._2).sum) }
    val got = Round21.q447FilterAblation.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, tok) = expect(r.getInt(0))
      assert(r.getLong(4) === n && r.getLong(5) === tok, s"bits ${r.getInt(0)}")
      assert(r.getBoolean(1) === (r.getInt(0) >= 4))
      assert(r.getBoolean(2) === ((r.getInt(0) % 4) >= 2))
      assert(r.getBoolean(3) === ((r.getInt(0) % 2) == 1))
    }
    assert(got.map(_.getLong(4)).sum === docs.length.toLong)
  }

  // ---------------------------------------------------------------- q448

  test("q448 sample audit == driver reference; sampling undercounts duplication") {
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$id:audit").take(8), 16) % 10
    def rate(pred: Long => Boolean): (Long, Long) = {
      val sub = segs.filter(s => pred(bucket(s._1)))
      val dups = sub.groupBy(_._4).values.map(_.length - 1).sum.toLong
      (sub.length.toLong, dups)
    }
    val expect = Map(
      "full" -> rate(_ => true),
      "half" -> rate(_ < 5),
      "tenth" -> rate(_ < 1))
    val got = Round21.q448SampleAudit.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    val rates = got.map { r =>
      val (n, d) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === d, r.getString(0))
      assert(closeTo(numD(r, 3), snapD(d.toDouble / n)))
      r.getString(0) -> numD(r, 3)
    }.toMap
    // duplicate pairs straddle the sample cut: smaller samples can only
    // see a lower-or-equal dup rate than the full corpus
    assert(rates("tenth") <= rates("full") + 1e-9)
    assert(rates("half") <= rates("full") + 1e-9)
  }

  // ---------------------------------------------------------------- q449

  test("q449 rare-gram keys == driver df reference; rates in [0,1]") {
    val gramsByDoc = docs.map { case (id, text, _, src) =>
      (id, src, words(text).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
    }
    val df = gramsByDoc.flatMap(_._3).groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val withGrams = gramsByDoc.filter(_._3.nonEmpty)
    val expect = withGrams.groupBy(_._2).map { case (src, ds) =>
      val minDfs = ds.map(d => d._3.map(df).min)
      src -> (ds.length.toLong, minDfs.count(_ == 1L).toLong,
        snapD(minDfs.count(_ == 1L).toDouble / ds.length),
        snapD(minDfs.map(_.toDouble).sum / ds.length))
    }
    val got = Round21.q449RareGramKeys.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, ident, rate, mean) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === ident, r.getString(0))
      assert(closeTo(numD(r, 3), rate) && closeTo(numD(r, 4), mean))
      assert(numD(r, 3) >= 0.0 && numD(r, 3) <= 1.0 && numD(r, 4) >= 1.0 - 1e-9)
    }
  }

  // ---------------------------------------------------------------- q450

  test("q450 redundancy curve == driver quintile reference; rows partition segments") {
    val quintile: Map[Long, Int] = docs.groupBy(_._4).toSeq.flatMap { case (_, ds) =>
      val sorted = ds.map(_._1).sorted
      val n = sorted.length
      sorted.zipWithIndex.map { case (id, i) => id -> (i * 5 / n) }
    }.toMap
    val expect = markedSegs.groupBy(t => (t._1._2, quintile(t._1._1)))
      .map { case (k, xs) =>
        k -> (xs.size.toLong, xs.count(_._2).toLong,
          snapD(xs.count(_._2).toDouble / xs.size))
      }
    val got = Round21.q450RedundancyCurve.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSet === expect.keySet)
    got.foreach { r =>
      val (n, red, rate) = expect((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) === n && r.getLong(3) === red,
        s"${r.getString(0)}/q${r.getInt(1)}")
      assert(closeTo(numD(r, 4), rate))
    }
    assert(got.map(_.getLong(2)).sum === segs.length.toLong)
  }
}
