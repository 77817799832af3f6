package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Round14
import graft.sources.Tables

/** Differential checks for the round-14 budget-planning operators:
  * driver-side brute-force references over the sf0.001 tables (explicit
  * loops, no SQL), so the relational formulations are validated against
  * independent math, not just cross-engine parity.
  */
class Round14PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def snapD(x: Double): Double =
    math.floor(x * 1073741824.0 + 0.5) / 1073741824.0

  private def qi(x: Double): Long = math.floor(x * 1048576.0 + 0.5).toLong

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

  private def words(text: String): Array[String] =
    "[a-z]+".r.findAllIn(text.toLowerCase).toArray

  /** (source → (totalTokens, uniqueTokens)) — exact-dedup within source. */
  private lazy val sourceTokens: Map[String, (Long, Long)] =
    docs.groupBy(_._4).map { case (src, ds) =>
      val byText = ds.groupBy(_._2)
      // .keys is a Set — map through a Seq or equal word counts collapse
      val uniq = byText.keys.toSeq.map(t => words(t).length.toLong).sum
      val total = byText.map { case (t, xs) => words(t).length.toLong * xs.length }.sum
      src -> (total, uniq)
    }

  // ---------------------------------------------------------------- q411

  test("q411 scaling epochs == driver Muennighoff closed form") {
    val rstar = 15.4
    val got = Round14.q411ScalingEpochs.fn(spark, sfDir).collect()
    assert(got.length === sourceTokens.size * 5)
    got.foreach { r =>
      val (src, e, u) = (r.getString(0), r.getInt(1), r.getLong(2))
      assert(u === sourceTokens(src)._2)
      assert(r.getLong(3) === u * e)
      val decay = snapD(math.exp(-(e - 1.0) / rstar))
      val eff = snapD(u * (1.0 + rstar * (1.0 - decay)))
      assert(closeTo(numD(r, 4), eff), s"$src/$e eff")
      assert(closeTo(numD(r, 5), snapD(eff / (u.toDouble * e))), s"$src/$e frac")
      if (e == 1) assert(math.abs(numD(r, 5) - 1.0) < 1e-9)
    }
    // effective fraction strictly decays with epochs per source
    got.groupBy(_.getString(0)).values.foreach { rs =>
      val byE = rs.sortBy(_.getInt(1)).map(numD(_, 5))
      byE.sliding(2).foreach { case Array(a, b) => assert(b < a + 1e-12) }
    }
  }

  // ---------------------------------------------------------------- q412

  test("q412 waterfill == driver cap search; allocations hit the budget") {
    val us = sourceTokens.toSeq.map { case (s, (_, u)) => (s, u) }
    val budget = math.floor(us.map(_._2).sum * 0.6).toLong
    val asc = us.sortBy(t => (t._2, t._1))
    val n = asc.length
    // driver reference: scan ranks for the feasible tau
    var tau = Double.NaN
    var prefix = 0L
    for ((r, i) <- asc.zipWithIndex) {
      val cand = snapD((budget - prefix).toDouble / (n - i).toDouble)
      val prev = if (i == 0) 0L else asc(i - 1)._2
      if (tau.isNaN && cand >= prev && cand <= r._2) tau = cand
      prefix += r._2
    }
    assert(!tau.isNaN)
    val got = Round14.q412WaterfillBudget.fn(spark, sfDir).collect()
    assert(got.length === n)
    var allocSum = 0.0
    got.foreach { r =>
      val u = sourceTokens(r.getString(0))._2
      assert(r.getLong(1) === u)
      val alloc = snapD(math.min(u.toDouble, tau))
      assert(closeTo(numD(r, 2), alloc), s"${r.getString(0)} alloc")
      assert(r.getBoolean(3) === (u > tau))
      assert(closeTo(numD(r, 4), tau))
      allocSum += numD(r, 2)
    }
    // Σ alloc == budget up to per-source snap error
    assert(math.abs(allocSum - budget) <= n * 1e-9 * math.max(1.0, budget.toDouble))
  }

  // ---------------------------------------------------------------- q413

  test("q413 logistic Newton == driver reference trajectory; loss decreases") {
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val feat = docs.flatMap { case (_, text, lang, _) =>
      val ws = words(text)
      if (ws.isEmpty) None
      else {
        val ratio = ws.count(stop).toDouble / ws.length
        Some((if (lang == "en") 1.0 else 0.0, qi(ratio).toDouble / 1048576.0))
      }
    }
    var b0 = 0.0; var b1 = 0.0
    val traj = (1 to 3).map { _ =>
      var g0q, g1q, h00q, h01q, h11q, lq = 0L
      feat.foreach { case (y, x) =>
        val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        g0q += qi(y - p); g1q += qi((y - p) * x)
        val w = p * (1.0 - p)
        h00q += qi(w); h01q += qi(w * x); h11q += qi(w * x * x)
        lq += qi(-(y * math.log(math.max(p, 1e-12)) +
          (1.0 - y) * math.log(math.max(1.0 - p, 1e-12))))
      }
      val (g0, g1) = (g0q / 1048576.0, g1q / 1048576.0)
      val (h00, h01, h11) = (h00q / 1048576.0, h01q / 1048576.0, h11q / 1048576.0)
      val det = h00 * h11 - h01 * h01
      b0 = snapD(b0 + (h11 * g0 - h01 * g1) / det)
      b1 = snapD(b1 + (h00 * g1 - h01 * g0) / det)
      (b0, b1, snapD(lq / 1048576.0 / feat.length))
    }
    val got = Round14.q413LogisticQuality.fn(spark, sfDir).collect()
    assert(got.length === 3)
    got.zip(traj).foreach { case (r, (eb0, eb1, el)) =>
      assert(closeTo(numD(r, 1), eb0), s"iter ${r.getInt(0)} b0")
      assert(closeTo(numD(r, 2), eb1), s"iter ${r.getInt(0)} b1")
      assert(closeTo(numD(r, 3), el), s"iter ${r.getInt(0)} loss")
    }
    // Newton on a concave log-likelihood: loss after step 3 <= after step 2
    // (iter-k row carries the loss measured AT beta_{k-1}, so compare 2→3)
    assert(numD(got(2), 3) <= numD(got(1), 3) + 1e-9)
  }

  // ---------------------------------------------------------------- q414

  test("q414 vocab OOV == driver reference; rates in [0,1]") {
    val all = docs.flatMap(d => words(d._2).map(w => (d._3, d._4, w)))
    val vocab = all.groupBy(_._3).map { case (w, xs) => (w, xs.length) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(200).map(_._1).toSet
    val expect = all.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      val types = xs.groupBy(_._3).map { case (w, ys) => (w, ys.length.toLong) }
      val nTok = xs.length.toLong
      val oovTok = types.collect { case (w, c) if !vocab(w) => c }.sum
      val nTyp = types.size.toLong
      val oovTyp = types.keys.count(w => !vocab(w)).toLong
      k -> (nTok, oovTok, nTyp, oovTyp)
    }
    val got = Round14.q414VocabOov.fn(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expect.keySet)
    got.foreach { r =>
      val (nTok, oovTok, nTyp, oovTyp) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === nTok && r.getLong(3) === oovTok)
      assert(r.getLong(4) === nTyp && r.getLong(5) === oovTyp)
      assert(closeTo(numD(r, 6), snapD(oovTok.toDouble / nTok)))
      assert(closeTo(numD(r, 7), snapD(oovTyp.toDouble / nTyp)))
      assert(numD(r, 6) >= 0 && numD(r, 6) <= 1 && numD(r, 7) >= 0 && numD(r, 7) <= 1)
    }
  }

  // ---------------------------------------------------------------- q415

  test("q415 class balance == driver effective-number reference") {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("label")).collect().map(_.getInt(0))
    val cnt = labels.groupBy(identity).map { case (l, xs) => l -> xs.length.toLong }
    val beta = 0.999
    val eff = cnt.map { case (l, n) =>
      l -> snapD((1.0 - snapD(math.exp(n * math.log(beta)))) / (1.0 - beta))
    }
    val wRaw = eff.map { case (l, e) => l -> snapD(1.0 / e) }
    val k = cnt.size
    val wsum = wRaw.values.sum
    val epochDen = wRaw.map { case (l, w) => w * cnt(l) }.sum
    val got = Round14.q415ClassBalance.fn(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSeq === cnt.keys.toSeq.sorted)
    got.foreach { r =>
      val l = r.getInt(0)
      assert(r.getLong(1) === cnt(l))
      assert(closeTo(numD(r, 2), eff(l)), s"label $l eff_n")
      assert(closeTo(numD(r, 3), snapD(wRaw(l) * k / wsum)), s"label $l w_norm")
      assert(closeTo(numD(r, 4), snapD(wRaw(l) * cnt(l) / epochDen)), s"label $l share")
    }
    // rarer classes get strictly larger normalized weights
    val byN = got.sortBy(_.getLong(1)).map(numD(_, 3))
    byN.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9); case _ => }
    // epoch shares sum to 1
    assert(math.abs(got.map(numD(_, 4)).sum - 1.0) < 1e-6)
  }
}
