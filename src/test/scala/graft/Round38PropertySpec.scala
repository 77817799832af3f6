package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-38 differential sweeps — driver references for the JM
  * interpolation sweep and the composed curation funnel.
  */
class Round38PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0
  private def qiL(x: Double): Long =
    math.floor(x * 1048576.0 + 0.5).toLong
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def md5i8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private lazy val docs = graft.sources.Tables.documents(spark, sfDir)
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("q499 JM sweep equals the driver interpolation fold") {
    def words(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    val split = docs.map { case (id, t) =>
      (id, t, if (md5i8(s"jm:$id") % 5 == 0) "test" else "train")
    }
    def transitions(slice: String) = split.filter(_._3 == slice)
      .flatMap(d => words(d._2).sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
    val trainToks = split.filter(_._3 == "train").flatMap(d => words(d._2))
    val uni = trainToks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val t = trainToks.length.toLong
    val v = uni.size.toLong
    val bi = transitions("train").groupBy(identity)
      .map { case (p, xs) => p -> xs.length.toLong }
    val ctx = bi.groupBy(_._1._1).map { case (p, xs) => p -> xs.values.sum }
    val testTr = transitions("test")
    val expected = Seq(1, 2, 3).map { ll =>
      val lam = ll.toDouble / 4.0
      val terms = testTr.map { case (prev, w) =>
        val pbi = bi.get((prev, w))
          .map(c => c.toDouble / ctx(prev)).getOrElse(0.0)
        val puni = (uni.getOrElse(w, 0L) + 1).toDouble / (t + v + 1)
        qiL(-math.log(lam * pbi + (1.0 - lam) * puni))
      }
      val ce = terms.sum.toDouble / 1048576.0 / testTr.length
      (lam, testTr.length.toLong, snapD(ce), snapD(math.exp(ce)))
    }
    val got = SparkEntry.queries("q499_jm_interpolation")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q500 funnel equals the driver pipeline replay") {
    def cleanWords(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    val base = docs.map { case (id, t) => (id, t, cleanWords(t).length.toLong) }
    // stage 2: exact dedup by full-text md5
    val keep2 = base.groupBy(d => md5hex(d._2)).values.map(_.minBy(_._1)._1).toSet
    val s2 = base.filter(d => keep2(d._1))
    // stage 3: near-dup clusters at 0.9 (space-split word 3-grams)
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val gs = s2.map(d => d._1 -> grams(d._2)).filter(_._2.nonEmpty)
    val pairs = for {
      i <- gs.indices; j <- (i + 1) until gs.length
      (a, ga) = gs(i); (b, gb) = gs(j)
      inter = ga.intersect(gb).size
      if inter > 0
      jac = BigDecimal(inter.toDouble / ga.union(gb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.9
    } yield (math.min(a, b), math.max(a, b))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val reps = clustered.groupBy(find).map { case (_, xs) => xs.min }.toSet
    val s3 = s2.filter(d => !clustered.contains(d._1) || reps(d._1))
    // stage 4: top 75% by distinct clean-word count (desc, id asc)
    val ranked = s3.map(d => (d._1, d._3, cleanWords(d._2).distinct.length.toLong))
      .sortBy { case (id, _, s) => (-s, id) }
    val rMax = ((75L * ranked.length + 99) / 100).toInt
    val s4 = ranked.take(rMax)
    val stages = Seq(
      (1L, "raw", base.length.toLong, base.map(_._3).sum),
      (2L, "exact_dedup", s2.length.toLong, s2.map(_._3).sum),
      (3L, "neardup_090", s3.length.toLong, s3.map(_._3).sum),
      (4L, "quality_top75", s4.length.toLong, s4.map(_._2).sum))
    val (rd, rt) = (stages.head._3, stages.head._4)
    val expected = stages.map { case (id, nm, d, tk) =>
      (id, nm, d, tk, snapD(d.toDouble / rd), snapD(tk.toDouble / rt))
    }
    val got = SparkEntry.queries("q500_curation_funnel")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // the funnel only ever narrows
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
  }
}
