package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-29 differential sweeps — driver references for the
  * inference-economics audits: the speculative-decoding acceptance fold
  * (bigram-argmax draft) and the prefix-cache ROI fold. The DuckDB
  * oracle replays the same SQL text in both engines, so these driver
  * recomputations are the net that catches text-level bugs the hash
  * gate cannot (the q98-class).
  */
class Round29PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  /** (doc_id, source, tokens) — the Round15 tokenizer, driver-side. */
  private def docs(): Array[(Long, String, Array[String])] =
    graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)))

  test("q476 acceptance sheet equals the driver bigram-argmax fold") {
    val ds = docs()
    // transitions (source, prev, nxt); bigram counts are corpus-global
    val tr = ds.flatMap { case (_, src, ws) =>
      ws.sliding(2).filter(_.length == 2).map(p => (src, p(0), p(1)))
    }
    val bg = tr.groupBy(t => (t._2, t._3)).map { case (k, xs) => k -> xs.length.toLong }
    // draft: per prev, most frequent next (count desc, word asc)
    val draft = bg.toSeq.groupBy(_._1._1).map { case (prev, xs) =>
      prev -> xs.minBy { case ((_, nxt), c) => (-c, nxt) }._1._2
    }
    val bySource = tr.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val acc = xs.count(t => draft(t._2) == t._3).toLong
      val rate = acc.toDouble / n
      (src, n, acc, snapD(rate), snapD(1.0 / (1.0 - rate)))
    }
    val got = SparkEntry.queries("q476_speculative_acceptance")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == bySource, s"got $got expected $bySource")
  }

  test("q477 prefix-cache ROI equals the driver prefix-savings fold") {
    val ds = docs()
    val totalTokens = ds.map(_._3.length.toLong).sum
    val expected = Seq(8, 16, 32).map { d =>
      val pref = ds.filter(_._3.length >= d).map(_._3.take(d).mkString(" "))
      val nDocs = pref.length.toLong
      val nPrefixes = pref.distinct.length.toLong
      val saved = d * (nDocs - nPrefixes)
      (d.toLong, nDocs, nPrefixes, saved,
        snapD(saved.toDouble / totalTokens))
    }
    val got = SparkEntry.queries("q477_prefix_cache_roi")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(got == expected, s"got $got expected $expected")
    // saved tokens can never exceed the corpus and must shrink as the
    // required depth prunes docs faster than it grows per-doc savings
    // is NOT an invariant — but coverage is monotone non-increasing:
    assert(expected.map(_._2) == expected.map(_._2).sorted.reverse)
  }
}
