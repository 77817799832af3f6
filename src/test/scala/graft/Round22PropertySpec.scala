package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round22
import graft.sources.Tables

/** Differential checks for the round-22 mining/profiling queries:
  * driver-side brute-force references over the sf0.001 tables (explicit
  * loops, no SQL). q451's reference enumerates all cross-language pairs
  * and applies the same rare-word blocking predicate, validating the
  * SQL's candidate generation and scoring independently.
  */
class Round22PropertySpec extends AnyFunSuite {

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

  // ---------------------------------------------------------------- q451

  test("q451 bitext mining == driver reference over candidate pairs") {
    val wcMap = docs.map(d => d._1 -> words(d._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }).toMap
    val gramsOf = docs.map { d =>
      d._1 -> words(d._2).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val gramDf = gramsOf.values.flatten.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val rare = gramDf.collect { case (g, c) if c <= 3 => g }.toSet
    val langOf = docs.map(d => d._1 -> d._3).toMap
    val ids = docs.map(_._1).sorted
    val cands = for {
      a <- ids; b <- ids
      if a < b && langOf(a) != langOf(b)
      if gramsOf(a).intersect(gramsOf(b)).exists(rare)
    } yield (a, b)
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (wcMap(a), wcMap(b))
      val dot = va.keysIterator.map(w => va(w) * vb.getOrElse(w, 0L)).sum
      val na = va.values.map(c => c * c).sum
      val nb = vb.values.map(c => c * c).sum
      snapD(dot / math.sqrt(na.toDouble * nb))
    }
    val expect = cands.map { case (a, b) => (a, b, cos(a, b)) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(15)
    val got = Round22.q451BitextMining.fn(spark, sfDir).collect()
    assert(got.length === expect.length)
    got.zip(expect).foreach { case (r, (a, b, c)) =>
      assert(r.getLong(0) === a && r.getLong(1) === b, s"pair $a/$b")
      assert(r.getString(2) === langOf(a) && r.getString(3) === langOf(b))
      assert(closeTo(numD(r, 4), c))
    }
  }

  // ---------------------------------------------------------------- q452

  test("q452 pipeline order == driver reference; filter-first bills fewer stage-2 tokens") {
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docs.map { case (id, text, _, _) =>
      (id, words(text).length.toLong, md5(text.toLowerCase))
    }
    val firstByKey = d.groupBy(_._3).map { case (k, xs) => k -> xs.map(_._1).min }
    val total = d.map(_._2).sum
    val dedupKeep = d.filter(x => firstByKey(x._3) == x._1)
    val dedupFirst = (total, dedupKeep.map(_._2).sum,
      dedupKeep.count(_._2 >= 150).toLong,
      dedupKeep.filter(_._2 >= 150).map(_._2).sum)
    val filtKeep = d.filter(_._2 >= 150)
    val firstAmongFilt = filtKeep.groupBy(_._3).map { case (k, xs) => k -> xs.map(_._1).min }
    val ff = filtKeep.filter(x => firstAmongFilt(x._3) == x._1)
    val filterFirst = (total, filtKeep.map(_._2).sum, ff.length.toLong, ff.map(_._2).sum)
    val got = Round22.q452PipelineOrder.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("dedup_first") === dedupFirst)
    assert(got("filter_first") === filterFirst)
    // the filter can only shrink what dedup has to hash
    assert(got("filter_first")._2 <= got("dedup_first")._1)
  }

  // ---------------------------------------------------------------- q453

  test("q453 variance profile == driver sufficient-stats reference") {
    val expect = vecs.groupBy(_._2).map { case (label, vs) =>
      val dims = vs.head._3.length
      val vars = (0 until dims).map { d =>
        val n = vs.length
        val s1 = vs.map(v => qiD(v._3(d))).sum
        val s2 = vs.map(v => qiD(v._3(d) * v._3(d))).sum
        val m = s1.toDouble / (1048576.0 * n)
        snapD(s2.toDouble / (1048576.0 * n) - m * m)
      }
      label -> (dims.toLong, snapD(vars.sum), vars.max,
        snapD(vars.max * dims / vars.sum))
    }
    val got = Round22.q453VarianceProfile.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nd, tr, mx, an) = expect(r.getInt(0))
      assert(r.getLong(1) === nd)
      assert(closeTo(numD(r, 2), tr), s"label ${r.getInt(0)} trace")
      assert(closeTo(numD(r, 3), mx) && closeTo(numD(r, 4), an))
      // anisotropy ratio is at least 1 (max >= mean)
      assert(numD(r, 4) >= 1.0 - 1e-9)
    }
  }

  // ---------------------------------------------------------------- q454

  test("q454 MSTTR == driver segmental reference; values in (0,1]") {
    val expect = docs.groupBy(_._4).flatMap { case (src, ds) =>
      val segs = ds.flatMap(d => words(d._2).grouped(50).filter(_.length == 50))
      if (segs.isEmpty) None
      else {
        val ttrs = segs.map(g => g.distinct.length.toLong)
        Some(src -> (segs.length.toLong,
          snapD(ttrs.map(_.toDouble / 50.0).sum / segs.length),
          ttrs.min, ttrs.max))
      }
    }
    val got = Round22.q454Msttr.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, m, mn, mx) = expect(r.getString(0))
      assert(r.getLong(1) === n, r.getString(0))
      assert(closeTo(numD(r, 2), m))
      assert(r.getLong(3) === mn && r.getLong(4) === mx)
      assert(numD(r, 2) > 0.0 && numD(r, 2) <= 1.0)
    }
  }

  // ---------------------------------------------------------------- q455

  test("q455 dup histogram == driver reference; shares below 1") {
    val segs = docs.flatMap { case (id, text, _, _) =>
      words(text).grouped(16).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val classes = segs.groupBy(_._3).map(_._2.length.toLong)
    val totalInst = classes.sum
    val expect = classes.filter(_ >= 2)
      .groupBy(m => if (m >= 5) "5+" else m.toString)
      .map { case (b, xs) =>
        b -> (xs.size.toLong, xs.sum, snapD(xs.sum.toDouble / totalInst))
      }
    val got = Round22.q455DupHistogram.fn(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (nc, ni, share) = expect(r.getString(0))
      assert(r.getLong(1) === nc && r.getLong(2) === ni, r.getString(0))
      assert(closeTo(numD(r, 3), share))
      assert(numD(r, 3) > 0.0 && numD(r, 3) < 1.0)
    }
  }
}
