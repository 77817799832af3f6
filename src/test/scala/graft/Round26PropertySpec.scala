package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-26 differential sweeps — exact driver references for
  * t-closeness TVD, the CKA gram pipeline and int8 recall.
  */
class Round26PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiD(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  test("q469 t-closeness equals the driver TVD reference") {
    val rows = graft.sources.Tables.customer(spark, sfDir)
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val segs = rows.map(_._2).distinct.sorted
    val total = rows.length.toDouble
    val globalP = segs.map(s => s -> snapD(rows.count(_._2 == s) / total)).toMap
    val expected = rows.groupBy(_._1).map { case (nk, xs) =>
      val devs = segs.map(s =>
        math.abs(snapD(xs.count(_._2 == s).toDouble / xs.length) - globalP(s)))
      nk -> (xs.length.toLong, snapD(devs.sum / 2.0), devs.max)
    }
    val got = SparkEntry.queries("q469_t_closeness")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (nk, e) =>
      assert(got(nk) == e, s"nation $nk: got ${got(nk)} expected $e")
    }
  }

  private lazy val vecs: Array[(Long, Array[Double])] = graft.sources.Tables
    .embeddings(spark, sfDir)
    .select("vec_id", "embedding")
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    .sortBy(_._1)

  /** Per-dim min-max int8 round-trip — the q470/q471 grid. */
  private def int8RoundTrip(vs: Array[(Long, Array[Double])]): Array[(Long, Array[Double])] = {
    val dims = vs.head._2.length
    val lo = Array.tabulate(dims)(d => vs.map(_._2(d)).min)
    val hi = Array.tabulate(dims)(d => vs.map(_._2(d)).max)
    vs.map { case (id, v) =>
      id -> Array.tabulate(dims) { d =>
        if (hi(d) == lo(d)) lo(d)
        else {
          val q = math.round((v(d) - lo(d)) / (hi(d) - lo(d)) * 255.0).toDouble
          lo(d) + q * snapD((hi(d) - lo(d)) / 255.0)
        }
      }
    }
  }

  test("q470 CKA equals the driver gram-pipeline reference") {
    val x = vecs
    val y = int8RoundTrip(x)
    val n = x.length
    val dims = x.head._2.length
    def center(vs: Array[(Long, Array[Double])]): Array[Array[Double]] = {
      val mu = Array.tabulate(dims)(d =>
        snapD(vs.map(v => qiD(v._2(d))).sum.toDouble / 1048576.0 / n))
      vs.map(v => Array.tabulate(dims)(d => snapD(v._2(d) - mu(d))))
    }
    val (cx, cy) = (center(x), center(y))
    def gram(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
      Array.tabulate(dims, dims) { (i, j) =>
        (0 until n).map(r => qiD(a(r)(i) * b(r)(j))).sum.toDouble / 1048576.0
      }
    def fro2(g: Array[Array[Double]]): Double =
      g.flatten.map(v => qiD(v * v)).sum.toDouble / 1048576.0
    val (fxy2, fxx2, fyy2) = (fro2(gram(cx, cy)), fro2(gram(cx, cx)), fro2(gram(cy, cy)))
    val expected = snapD(fxy2 / (math.sqrt(fxx2) * math.sqrt(fyy2)))
    val r = SparkEntry.queries("q470_cka_alignment")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getDouble(1) == expected, s"cka ${r.getDouble(1)} != $expected")
    assert(expected > 0.9, "int8 round-trip should preserve most geometry")
  }

  test("q471 int8 recall equals the driver top-5 reference") {
    val x = vecs
    val y = int8RoundTrip(x)
    def top5(vs: Array[(Long, Array[Double])], qid: Long): Seq[Long] = {
      val q = vs.find(_._1 == qid).get._2
      val qq = q.map(v => qiD(v * v)).sum.toDouble
      vs.filter(_._1 != qid)
        .map { case (id, c) =>
          val dt = q.zip(c).map { case (a, b) => qiD(a * b) }.sum.toDouble
          val cc = c.map(v => qiD(v * v)).sum.toDouble
          (id, snapD(dt / math.sqrt(qq * cc)))
        }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(5).map(_._1).toSeq
    }
    val expected = (0L until 10L).map { qid =>
      val full = top5(x, qid).toSet
      val int8 = top5(y, qid).toSet
      qid -> full.intersect(int8).size.toLong
    }.toMap
    val got = SparkEntry.queries("q471_int8_recall")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
