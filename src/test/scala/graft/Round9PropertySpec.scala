package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators._

/** Differential property sweeps for the round-9 operators: each engine
  * result is checked against an independent brute-force Scala
  * reference on seeded random inputs — the permutation/partitioning-
  * independent truth the relational formulation must reproduce.
  */
class Round9PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sssp == brute-force Bellman-Ford on random graphs (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val n = 12
      val edges = (0 until 40).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong))
        .distinct
      val rounds = 4
      // reference: dense relaxation
      val inf = Long.MaxValue / 4
      val dist = Array.fill(n)(inf)
      dist(0) = 0L
      for (_ <- 1 to rounds) {
        val prev = dist.clone()
        for ((s, d, w) <- edges if prev(s.toInt) < inf)
          dist(d.toInt) = math.min(dist(d.toInt), prev(s.toInt) + w)
      }
      val got = Graph
        .ssspBellmanFord(
          (0L until n.toLong).toDF("id"), edges.toDF("src", "dst", "w"), 0L, rounds)
        .collect()
        .map(r => r.getLong(0).toInt -> (if (r.isNullAt(1)) inf else r.getLong(1)))
        .toMap
      for (i <- 0 until n)
        assert(got(i) === dist(i), s"seed=$seed node=$i")
    }
  }

  test("isotonic == driver PAVA on random bin tables (3 seeds)") {
    for (seed <- Seq(7, 8, 9)) {
      val rnd = new Random(seed)
      val bins = (0L until 8L).map(b => (b, 1 + rnd.nextInt(20), rnd.nextInt(21)))
        .map { case (b, w, s0) => (b, w, math.min(s0, w)) }
      val rows = bins.flatMap { case (b, w, s) =>
        Seq.fill(s)((b, 1L)) ++ Seq.fill(w - s)((b, 0L))
      }
      // reference PAVA: pool adjacent violators over (weight, mean)
      var pools = bins.map { case (_, w, s) => (w.toDouble, s.toDouble / w) }.toList
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ListBuffer[(Double, Double)]()
        for (p <- pools) {
          out += p
          while (out.length >= 2 && out(out.length - 2)._2 > out.last._2) {
            val (w2, m2) = out.remove(out.length - 1)
            val (w1, m1) = out.remove(out.length - 1)
            out += ((w1 + w2, (w1 * m1 + w2 * m2) / (w1 + w2)))
            changed = true
          }
        }
        pools = out.toList
      }
      val expected = pools.flatMap { case (w, m) => Seq.fill(math.round(w).toInt)(m) }
      val got = Isotonic.isotonicRates(rows.toDF("bin", "y"), col("bin"), col("y"))
        .orderBy("bin").collect().map(_.getDouble(4))
      // expand expected to one entry per bin (pools carry bin weights,
      // but bins have distinct weights — map by cumulative position)
      val binW = bins.map(_._2.toDouble)
      var acc = List.empty[Double]
      var rem = pools
      var carry = 0.0
      for (w <- binW) {
        val (pw, pm) = rem.head
        acc = acc :+ pm
        carry += w
        if (carry >= pw - 1e-9) { rem = rem.tail; carry = 0.0 }
      }
      for ((g, e) <- got.zip(acc))
        assert(math.abs(g - e) < 1e-5, s"seed=$seed got=${got.toSeq} exp=$acc")
      assert(got.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-9))
    }
  }

  test("caliper matching == brute-force nearest scan (3 seeds)") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val rows = (1 to 60).map { i =>
        ("b" + rnd.nextInt(3), i.toLong, rnd.nextInt(2).toLong,
          rnd.nextInt(50).toLong, rnd.nextInt(100).toLong)
      }
      val caliper = 4L
      // reference: nearest control by |dx|, ties -> lower x; within-x
      // ties -> the window-order winner (t asc, id asc gives the LAST
      // control at x' <= x in (x, t, id) order)
      val byBlock = rows.groupBy(_._1)
      var sumDy = 0L
      var sumDx = 0L
      var nMatched = 0L
      var nTreated = 0L
      for ((_, rs) <- byBlock) {
        val controls = rs.filter(_._3 == 0L)
        for (t <- rs.filter(_._3 == 1L)) {
          nTreated += 1
          if (controls.nonEmpty) {
            val below = controls.filter(c => c._4 <= t._4)
            val above = controls.filter(c => c._4 > t._4)
            val prev = if (below.nonEmpty)
              Some(below.maxBy(c => (c._4, c._2))) else None
            val next = if (above.nonEmpty)
              Some(above.minBy(c => (c._4, c._2))) else None
            val chosen = (prev, next) match {
              case (Some(p), Some(nx)) =>
                if (t._4 - p._4 <= nx._4 - t._4) Some(p) else Some(nx)
              case (Some(p), None) => Some(p)
              case (None, Some(nx)) => Some(nx)
              case _ => None
            }
            chosen.foreach { c =>
              val dx = math.abs(t._4 - c._4)
              if (dx <= caliper) {
                nMatched += 1; sumDx += dx; sumDy += t._5 - c._5
              }
            }
          }
        }
      }
      val out = Matching
        .nearestCaliperAtt(rows.toDF("block", "id", "t", "x", "y"), caliper)
        .collect().head
      assert(out.getLong(0) === nTreated, s"seed=$seed treated")
      assert(out.getLong(1) === nMatched, s"seed=$seed matched")
      if (nMatched > 0) {
        assert(math.abs(out.getDouble(3) - sumDx.toDouble / nMatched) < 1e-6)
        assert(math.abs(out.getDouble(4) - sumDy.toDouble / nMatched) < 1e-6)
      }
    }
  }

  test("ahash band join == brute-force all-pairs hamming (2 seeds)") {
    for (seed <- Seq(21, 22)) {
      val rnd = new Random(seed)
      val base = Array.fill(256)((rnd.nextInt(64) + 32).toByte)
      // near-dup family: flip a few bytes; plus unrelated payloads
      val payloads = (0 until 12).map { i =>
        val p = base.clone()
        for (_ <- 0 until i) p(rnd.nextInt(p.length)) = (rnd.nextInt(64) + 32).toByte
        (i.toLong, p)
      } ++ (12 until 20).map(i =>
        (i.toLong, Array.fill(100 + rnd.nextInt(200))((rnd.nextInt(64) + 32).toByte)))
      val media = payloads.toDF("doc_id", "payload")
      val hashes = Multimodal.imageAHash(media).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val expected = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        hd = java.lang.Long.bitCount(hashes(a)._1 ^ hashes(b)._1) +
          java.lang.Long.bitCount(hashes(a)._2 ^ hashes(b)._2)
        if hd <= 7
      } yield (a, b, hd.toLong)).toSet
      val got = Multimodal.aHashNearDup(media).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty, s"seed=$seed planted near-dups not found")
    }
  }

  test("bitmap intersections == set algebra on random id sets (2 seeds)") {
    for (seed <- Seq(31, 32)) {
      val rnd = new Random(seed)
      // ids span NEGATIVE values too: floor-div word assignment must not
      // collide id -1 with id 62 (truncating div did)
      val sets = Map(
        "x" -> (0 until 300).map(_ => rnd.nextInt(1000).toLong - 500L).toSet,
        "y" -> (0 until 300).map(_ => rnd.nextInt(1000).toLong - 500L).toSet,
        "z" -> (0 until 100).map(_ => rnd.nextInt(1000).toLong - 500L).toSet)
      val rows = sets.toSeq.flatMap { case (s, ids) =>
        // feed duplicates on purpose — OR must absorb them
        (ids.toSeq ++ ids.toSeq.take(10)).map(i => (s, i))
      }
      val got = graft.operators.Bitmap.intersections(rows.toDF("seg", "id"), "seg", "id")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      for (Seq(a, b) <- Seq("x", "y", "z").sorted.combinations(2)) {
        val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
        val inter = (sets(a) & sets(b)).size.toLong
        val uni = (sets(a) | sets(b)).size.toLong
        assert(got((a, b)) === ((na, nb, inter, uni)), s"seed=$seed pair=$a,$b")
      }
    }
  }
}
