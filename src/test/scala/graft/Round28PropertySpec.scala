package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-28 differential sweeps — driver references for the clustering
  * agreement sheet and the dedup percolation structure.
  */
class Round28PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  test("q474 agreement sheet equals the driver contingency reference") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = graft.operators.Similarity.ivfAssign(emb)
      .selectExpr("vec_id", "CAST(cell AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = labels.size.toLong
    val ct = labels.toSeq.groupBy { case (id, l) => (l, cells(id)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val ai = ct.groupBy(_._1._1).map { case (l, xs) => l -> xs.values.sum }
    val bj = ct.groupBy(_._1._2).map { case (c, xs) => c -> xs.values.sum }
    def c2(x: Long): Long = x * (x - 1) / 2
    val (sij, sa, sb, sn) =
      (ct.values.map(c2).sum, ai.values.map(c2).sum, bj.values.map(c2).sum, c2(n))
    val exp = sa.toDouble * sb / sn
    val ari = snapD((sij - exp) / ((sa.toDouble + sb) / 2.0 - exp))
    def ent(counts: Iterable[Long]): Double =
      snapD(counts.map(a => snapD(-(a.toDouble / n) * math.log(a.toDouble / n))).sum)
    val (hu, hv) = (ent(ai.values), ent(bj.values))
    val mi = snapD(ct.map { case ((l, c), nij) =>
      snapD((nij.toDouble / n) * math.log(nij.toDouble * n / (ai(l).toDouble * bj(c))))
    }.sum)
    val r = SparkEntry.queries("q474_cluster_agreement")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == ari, s"ari ${r.getDouble(1)} != $ari")
    assert(r.getDouble(2) == snapD(mi / math.sqrt(hu * hv)))
    assert(r.getDouble(3) == snapD(mi / hu))
    assert(r.getDouble(4) == snapD(mi / hv))
  }

  test("q475 percolation equals a driver union-find over exact pairs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val gs = docs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val pairs = for {
      i <- gs.indices; j <- (i + 1) until gs.length
      (a, ga) = gs(i); (b, gb) = gs(j)
      inter = ga.intersect(gb).size
      if inter > 0
      jac = BigDecimal(inter.toDouble / ga.union(gb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.9
    } yield (math.min(a, b), math.max(a, b), jac)
    def statsAt(t: Double): (Long, Long, Long, Long) = {
      val edges = pairs.filter(_._3 >= t)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val comps = nodes.groupBy(find)
      (edges.length.toLong, nodes.length.toLong, comps.size.toLong,
        if (comps.isEmpty) 0L else comps.values.map(_.length).max.toLong)
    }
    val got = SparkEntry.queries("q475_dedup_percolation")(spark, sfDir).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    Seq(0.97, 0.9).foreach { t =>
      val e = statsAt(t)
      assert(got(t) == e, s"t=$t: got ${got(t)} expected $e")
    }
  }
}
