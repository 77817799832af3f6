package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round19
import graft.sources.Tables

/** Differential checks for the round-19 production-ingest shapes:
  * driver-side brute-force references over the sf0.001 documents table
  * (explicit loops, no SQL).
  */
class Round19PropertySpec extends AnyFunSuite {

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

  private def bucket(id: Long, salt: String): Long =
    java.lang.Long.parseLong(md5hex(s"$id$salt").take(8), 16) % 10

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+", -1).filter(_.nonEmpty)

  /** (doc_id, source, seg_id, segText) — 16-token segments. */
  private lazy val segs: Array[(Long, String, Long, String)] =
    docs.flatMap { case (id, text, _, src) =>
      words(text).grouped(16).zipWithIndex.map { case (g, i) =>
        (id, src, i.toLong, g.mkString(" "))
      }
    }

  // ---------------------------------------------------------------- q436

  test("q436 shard manifest == driver interleaved prefix-sum reference") {
    val toks = docs.map(d => (d._4, d._1, words(d._2).length.toLong))
    val ranked = toks.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(_._2).zipWithIndex.map { case ((s, id, nw), i) => (i + 1L, s, id, nw) }
    }
    val ordered = ranked.sortBy { case (rn, src, _, _) => (rn, src) }
    var cum = 0L
    val placed = ordered.map { case (_, src, _, nw) =>
      val shard = cum / 4096
      cum += nw
      (shard, src, nw)
    }
    val expect = placed.groupBy(_._1).map { case (shard, xs) =>
      val bySrc = xs.groupBy(_._2).map { case (_, ys) => ys.map(_._3).sum }
      shard -> (xs.size.toLong, xs.map(_._3).sum, bySrc.size.toLong,
        snapD(bySrc.max.toDouble / xs.map(_._3).sum))
    }
    val got = Round19.q436ShardManifest.fn(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nd, nt, ns, share) = expect(r.getLong(0))
      assert(r.getLong(1) === nd && r.getLong(2) === nt && r.getLong(3) === ns,
        s"shard ${r.getLong(0)}")
      assert(closeTo(numD(r, 4), share))
    }
    // every full shard lands within one doc of the 4096 budget
    val full = got.dropRight(1)
    full.foreach(r => assert(r.getLong(2) >= 4096 - 400 || got.length == 1))
  }

  // ---------------------------------------------------------------- q437

  test("q437 incremental ingest == driver segment-overlap classification") {
    val oldSegs = segs.filter(x => bucket(x._1, ":ingest") < 8).map(_._4).toSet
    val newDocs = docs.filter(d => bucket(d._1, ":ingest") >= 8)
    val newSegsByDoc = segs.filter(x => bucket(x._1, ":ingest") >= 8).groupBy(_._1)
    val firstNew = segs.filter(x => bucket(x._1, ":ingest") >= 8).groupBy(_._4)
      .map { case (t, xs) => t -> xs.map(_._1).min }
    val cls = newDocs.map { case (id, _, _, src) =>
      val mySegs = newSegsByDoc.getOrElse(id, Array.empty).map(_._4)
      val c =
        if (mySegs.exists(oldSegs)) "overlaps_corpus"
        else if (mySegs.exists(t => firstNew(t) < id)) "overlaps_batch"
        else "fresh"
      (c, src, id)
    }
    val expect = cls.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong, xs.map(_._3).min)
    }
    val got = Round19.q437IncrementalIngest.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, ns, fd) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === ns && r.getLong(3) === fd,
        r.getString(0))
    }
    // classes partition the batch
    assert(got.map(_.getLong(1)).sum === newDocs.length.toLong)
  }

  // ---------------------------------------------------------------- q438

  test("q438 split contamination == driver leakage reference; rates in [0,1]") {
    val split = docs.map(d => d._1 -> (if (bucket(d._1, ":split") < 8) "train" else "test")).toMap
    val trainSegs = segs.filter(s => split(s._1) == "train").map(_._4).toSet
    val testDocs = docs.filter(d => split(d._1) == "test")
    val bySrc = testDocs.groupBy(_._4).map { case (src, ds) =>
      val hits = ds.count { d =>
        segs.filter(_._1 == d._1).exists(s => trainSegs(s._4))
      }
      src -> (ds.length.toLong, hits.toLong, snapD(hits.toDouble / ds.length))
    }
    val got = Round19.q438SplitContamination.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === bySrc.keySet)
    got.foreach { r =>
      val (n, hit, rate) = bySrc(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === hit, r.getString(0))
      assert(closeTo(numD(r, 3), rate))
      assert(numD(r, 3) >= 0.0 && numD(r, 3) <= 1.0)
    }
  }

  // ---------------------------------------------------------------- q439

  test("q439 corpus diff == driver reference; growth positive") {
    val expect = docs.groupBy(_._4).map { case (src, ds) =>
      val aTok = ds.filter(d => bucket(d._1, ":ver") < 9).flatMap(d => words(d._2))
      val newTok = ds.filter(d => bucket(d._1, ":ver") >= 9).flatMap(d => words(d._2))
      val aTypes = aTok.toSet
      val newTypes = newTok.toSet.diff(aTypes).size.toLong
      src -> (ds.count(d => bucket(d._1, ":ver") >= 9).toLong, newTok.length.toLong, newTypes,
        snapD(newTok.length.toDouble / aTok.length))
    }
    val got = Round19.q439CorpusDiff.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (dn, tn, nt, g) = expect(r.getString(0))
      assert(r.getLong(1) === dn && r.getLong(2) === tn && r.getLong(3) === nt,
        r.getString(0))
      assert(closeTo(numD(r, 4), g))
    }
  }

  // ---------------------------------------------------------------- q440

  test("q440 dedup attribution == driver first-occurrence reference") {
    val byText = segs.groupBy(_._4).filter(_._2.length >= 2)
    val expect = byText.toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(s => (s._1, s._3))
      val winner = sorted.head._2
      sorted.tail.map(s => (s._2, winner))
    }.groupBy(identity).map { case ((loser, winner), ys) =>
      (loser, winner) -> ys.size.toLong
    }
    val got = Round19.q440DedupAttribution.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expect.keySet)
    got.foreach { r =>
      assert(r.getLong(2) === expect((r.getString(0), r.getString(1))),
        s"${r.getString(0)}<-${r.getString(1)}")
    }
    // total lost segments == total dup instances beyond first occurrences
    val totalDups = byText.values.map(_.length - 1).sum.toLong
    assert(got.map(_.getLong(2)).sum === totalDups)
  }
}
