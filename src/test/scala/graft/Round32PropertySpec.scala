package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-32 differential sweeps — driver references for packing
  * contamination, the SLO burn digest, and the Sinkhorn transport.
  */
class Round32PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong

  test("q484 contamination equals the driver packing fold") {
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
      .sortBy(_._1)
    val expected = Seq(512L, 2048L).map { b =>
      var cum = 0L
      val byChunk = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      toks.foreach { case (_, n) =>
        val chunk = cum / b
        val (d, t, s2) = byChunk.getOrElse(chunk, (0L, 0L, 0L))
        byChunk(chunk) = (d + 1, t + n, s2 + n * n)
        cum += n
      }
      val chunks = byChunk.values.toSeq
      val nChunks = chunks.length.toLong
      val nDocs = chunks.map(_._1).sum
      val sumT = chunks.map(_._2).sum
      val sumT2 = chunks.map(c => c._2 * c._2).sum
      val sumS2 = chunks.map(_._3).sum
      (b, nChunks, nDocs,
        snapD(nDocs.toDouble / nChunks),
        snapD(sumT.toDouble / (nChunks * b.toDouble)),
        snapD((sumT2 - sumS2).toDouble / sumT2))
    }
    val got = SparkEntry.queries("q484_packing_contamination")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q485 burn digest equals the driver multiwindow fold") {
    val evs = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("CAST(unix_micros(ts) AS BIGINT) AS us", "event_type")
      .collect().map(r => (r.getLong(0) / 3600000000L, r.getString(1) == "error"))
    val hourly = evs.groupBy(_._1).map { case (hi, xs) =>
      (hi, xs.length.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val burns = hourly.map { case (hi, n1, e1) =>
      val in6 = hourly.filter(h => h._1 >= hi - 5 && h._1 <= hi)
      val n6 = in6.map(_._2).sum
      val e6 = in6.map(_._3).sum
      (hi, (e1.toDouble / n1) / 0.01, (e6.toDouble / n6) / 0.01)
    }
    val expected = burns.groupBy(_._1 / 24).toSeq.sortBy(_._1).map { case (day, xs) =>
      (day, xs.length.toLong,
        xs.count(b => b._2 > 14.4 && b._3 > 6.0).toLong,
        snapD(xs.map(_._2).max), snapD(xs.map(_._3).max))
    }
    val got = SparkEntry.queries("q485_slo_burn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got ${got.take(3)} expected ${expected.take(3)}")
  }

  test("q486 transport equals the driver Sinkhorn reference") {
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("[^a-z]+")
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val sa = words.map(_._1).min
    val sb = words.map(_._1).max
    def hist(src: String): Map[Long, Double] = {
      val bins = words.filter(_._1 == src).map(w => math.min(w._2.length, 15).toLong)
      val t = bins.length
      bins.groupBy(identity).map { case (b, xs) => b -> snapD(xs.length.toDouble / t) }
    }
    val a = hist(sa); val b = hist(sb)
    val is = a.keys.toSeq.sorted; val js = b.keys.toSeq.sorted
    def kv(i: Long, j: Long): Double = snapD(math.exp(-(math.abs((i - j).toDouble) / 14.0) / 0.1))
    def cost(i: Long, j: Long): Double = snapD(math.abs((i - j).toDouble) / 14.0)
    var v = js.map(_ -> 1.0).toMap
    var u = Map.empty[Long, Double]
    for (_ <- 1 to 5) {
      u = is.map { i =>
        val s = js.map(j => qiL(kv(i, j) * v(j))).sum.toDouble / 1048576.0
        i -> snapD(a(i) / s)
      }.toMap
      v = js.map { j =>
        val s = is.map(i => qiL(kv(i, j) * u(i))).sum.toDouble / 1048576.0
        j -> snapD(b(j) / s)
      }.toMap
    }
    val p = for (i <- is; j <- js) yield (i, j, snapD(u(i) * kv(i, j) * v(j)))
    val tCost = snapD(p.map { case (i, j, pv) => qiL(pv * cost(i, j)) }.sum.toDouble / 1048576.0)
    val rowL1 = snapD(is.map { i =>
      val rq = p.filter(_._1 == i).map(x => qiL(x._3)).sum.toDouble / 1048576.0
      qiL(math.abs(rq - a(i)))
    }.sum.toDouble / 1048576.0)
    val r = SparkEntry.queries("q486_sinkhorn_ot")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == is.length.toLong)
    assert(r.getLong(1) == js.length.toLong)
    assert(r.getDouble(2) == tCost, s"cost ${r.getDouble(2)} != $tCost")
    assert(r.getDouble(3) == rowL1, s"l1 ${r.getDouble(3)} != $rowL1")
    // five rounds should leave the row marginals essentially converged
    assert(r.getDouble(3) < 0.05)
  }
}
