package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-27 differential sweeps: multi-probe LSH probe-sequence parity
  * against a driver replay of the md5 plane family, and the
  * candidate-superset invariant that justifies q473's comparison.
  */
class Round27PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("SrpMultiProbe probe sequences equal the driver plane replay") {
    import spark.implicits._
    val (tables, ppt, nprobe, dim) = (4, 6, 3, 64)
    graft.functions.SrpMultiProbe
      .registerMd5(spark, "mp_test", dim, tables, ppt, nprobe)
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter($"vec_id" < 20)
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val planes = graft.functions.SrpSignatures.makePlanesMd5(dim, tables, ppt)
    def reference(vec: Array[Float]): Seq[Int] = {
      (0 until tables).flatMap { t =>
        val dots = (0 until ppt).map { p =>
          val base = (t * ppt + p) * dim
          var dot = 0.0
          var i = 0
          while (i < dim) { dot += vec(i) * planes(base + i); i += 1 }
          dot
        }
        val sig = dots.zipWithIndex.foldLeft(0) { case (acc, (d, p)) =>
          if (d >= 0) acc | (1 << p) else acc
        }
        val order = (0 until ppt).sortBy(p => (math.abs(dots(p)), p))
        sig +: (1 until nprobe).map(r => sig ^ (1 << order(r - 1)))
      }
    }
    val got = graft.sources.Tables.embeddings(spark, sfDir)
      .filter($"vec_id" < 20)
      .select($"vec_id", expr("mp_test(embedding)").as("probes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq)
      .toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == reference(v), s"vec $id probe sequence mismatch")
    }
  }

  test("multi-probe candidates are a superset of single-probe candidates") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    // k larger than the corpus → the reranked output IS the candidate set
    def candSet(nprobe: Int): Set[(Long, Long)] =
      Similarity.multiProbeTopKMd5(emb, probes, k = 100000, nprobe = nprobe)
        .select(col("query_id"), col("neighbor_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    val one = candSet(1)
    val three = candSet(3)
    assert(one.subsetOf(three),
      s"single-probe candidates not contained: ${(one -- three).take(5)}")
    assert(three.size > one.size, "extra probes generated no new candidates")
  }

  test("q473 output: both arms over 10 queries, recall in [0,1], snapped") {
    val rows = SparkEntry.queries("q473_probe_recall")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq("lsh_probe1", "lsh_probe3"))
    rows.foreach { case (m, n, rec) =>
      assert(n == 10L, s"$m n_queries $n")
      assert(rec >= 0.0 && rec <= 1.0, s"$m recall $rec")
    }
  }
}
