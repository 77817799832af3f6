package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-39 differential sweeps — driver references for the MoE balance
  * chart, the CUSUM alarm closed form, context-fit economics, the
  * gradient-noise proxy, bucketed padding waste, and the Cramér–von
  * Mises rank statistic. These exist because oracle parity alone cannot
  * catch a bug baked into the shared generated SQL text (both engines
  * replay it); the Scala folds below recompute every number from first
  * principles.
  */
class Round39PropertySpec extends AnyFunSuite {

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

  private def words(t: String): Array[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q501

  test("q501 MoE balance equals the driver routing replay") {
    val toks = docs.flatMap { case (id, t) =>
      words(t).zipWithIndex.map { case (w, p) => (id, p, w) }
    }
    val n = toks.length.toLong
    // top-2 gating per token
    case class Routed(docId: Long, pos: Int, top1: Long, pq: Map[Long, Long])
    val routed = toks.map { case (id, p, w) =>
      val gates = (0L to 7L).map(e => (e, md5i8(s"moe:$w:$e") % 1048576L))
      val sorted = gates.sortBy { case (e, g) => (-g, e) }
      val pair = sorted.take(2)
      val gsum = pair.map(_._2).sum
      val pq = pair.map { case (e, g) =>
        e -> qiL(g.toDouble / math.max(gsum, 1L))
      }.toMap
      Routed(id, p, pair.head._1, pq)
    }
    val experts = 0L to 7L
    val nTop1 = experts.map(e => e -> routed.count(_.top1 == e).toLong).toMap
    val sq = experts.map(e => e -> routed.map(_.pq.getOrElse(e, 0L)).sum).toMap
    val capacity = (5L * n) / 32L
    val nDropped = experts.map { e =>
      val arrivals = routed.filter(_.top1 == e).sortBy(r => (r.docId, r.pos))
      e -> math.max(0L, arrivals.length.toLong - capacity)
    }.toMap
    val auxq = experts.map { e =>
      qiL((nTop1(e).toDouble / n) * (sq(e).toDouble / n / 1048576.0))
    }.sum
    val expected = experts.map { e =>
      (e, nTop1(e), snapD(nTop1(e).toDouble / n),
        snapD(sq(e).toDouble / n / 1048576.0), nDropped(e),
        snapD(8.0 * auxq / 1048576.0))
    }
    val got = SparkEntry.queries("q501_moe_balance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // loads and gate masses are shares: they sum to ~1 (quantization slack)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
  }

  // ---------------------------------------------------------------- q502

  test("q502 CUSUM alarms equal the sequential chart replay") {
    val micros = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) AS us").collect().map(_.getLong(0))
    val hours = micros.map(us => Math.floorDiv(us, 3600000000L))
    val mn = hours.min
    val mx = hours.max
    val byHour = hours.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    val xs = (mn to mx).map(h => byHour.getOrElse(h, 0L))
    val n = xs.length.toLong
    val sm = xs.sum
    // the SEQUENTIAL recursion the query's closed form must match:
    // S_i = max(0, S_{i-1} + n*x_i - sm)
    var s = 0L
    val chart = xs.map { x => s = math.max(0L, s + n * x - sm); s }
    val maxStat = chart.max
    val expected = Seq(1L, 2L, 4L).map { m =>
      val alarms = chart.zipWithIndex.filter { case (c, _) => c > m * sm }
      (m, alarms.length.toLong,
        alarms.headOption.map(_._2.toLong).getOrElse(-1L),
        maxStat, snapD(maxStat.toDouble / sm))
    }
    val got = SparkEntry.queries("q502_cusum_alarms")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  // ---------------------------------------------------------------- q503

  test("q503 context fit equals the per-document fold") {
    val lens = docs.map { case (_, t) => words(t).length.toLong }
    val expected = Seq(128L, 512L, 2048L).map { w =>
      val chunks = lens.map(l => (l + w - 1) / w)
      val padded = chunks.map(_ * w)
      (w, lens.length.toLong, lens.count(_ <= w).toLong, chunks.sum,
        padded.sum - lens.sum, lens.map(l => math.max(l - w, 0L)).sum,
        snapD(lens.sum.toDouble / padded.sum),
        snapD(lens.map(l => math.min(l, w)).sum.toDouble / lens.sum))
    }
    val got = SparkEntry.queries("q503_context_fit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // more chunks with smaller windows; padding share shrinks as W grows
    assert(got.map(_._4).reverse == got.map(_._4).reverse.sorted)
  }

  // ---------------------------------------------------------------- q504

  test("q504 gradient noise equals the sufficient-statistics fold") {
    val rows = graft.sources.Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = rows.head._2.length
    def stats(vs: Seq[Array[Float]]): (Long, Double, Double) = {
      val n = vs.length.toLong
      val perDim = (0 until dims).map { d =>
        val s1 = vs.map(v => qiL(v(d).toDouble)).sum
        val s2 = vs.map(v => qiL(v(d).toDouble * v(d).toDouble)).sum
        val mu = s1.toDouble / (1048576.0 * n)
        (snapD(s2.toDouble / (1048576.0 * n) - mu * mu), snapD(mu * mu))
      }
      (n, snapD(perDim.map(_._1).sum), snapD(perDim.map(_._2).sum))
    }
    val perLabel = rows.groupBy(_._1).toSeq.map { case (l, vs) =>
      (l, stats(vs.map(_._2).toSeq))
    }
    val pooled = (-1, stats(rows.map(_._2).toSeq))
    val expected = (pooled +: perLabel).sortBy(_._1).map { case (l, (n, tr, mu)) =>
      (l, n, tr, mu, snapD(tr / mu))
    }
    val got = SparkEntry.queries("q504_gradient_noise")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // pooled trace >= any single label's within-label trace is NOT
    // guaranteed, but every trace and mean-norm must be positive
    assert(got.forall(r => r._3 > 0.0 && r._4 > 0.0))
  }

  // ---------------------------------------------------------------- q505

  test("q505 length bucketing equals the sorted-partition replay") {
    val byDoc = docs.map { case (id, t) => (id, words(t).length.toLong) }
      .sortBy { case (id, l) => (l, id) }
    val n = byDoc.length.toLong
    val expected = Seq(1L, 2L, 4L, 8L).map { k =>
      val buckets = byDoc.zipWithIndex
        .groupBy { case (_, i) => i.toLong * k / n }
      val per = buckets.values.map { b =>
        val lens = b.map(_._1._2)
        (lens.max * lens.length, lens.sum)
      }
      val padded = per.map(_._1).sum
      val tot = per.map(_._2).sum
      (k, buckets.size.toLong, padded - tot, padded,
        snapD((padded - tot).toDouble / padded))
    }
    val got = SparkEntry.queries("q505_length_bucketing")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // more buckets never pad more
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  // ---------------------------------------------------------------- q506

  test("q506 Cramér–von Mises equals the rank-formula replay") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_id", "value",
        "CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val combined = ev.sortBy { case (id, v, _) => (v, id) }
    val ranked = combined.zipWithIndex.map { case ((id, _, g), i) => (id, g, i + 1L) }
    val within = (0 to 1).flatMap { g =>
      combined.filter(_._3 == g).zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }
    }.toMap
    val bySample = ranked.groupBy(_._2).map { case (g, rs) =>
      val ss = rs.map { case (id, _, rr) =>
        val d = rr - within(id); d * d
      }.sum
      g -> (rs.length.toLong, ss)
    }
    val (n, sx) = bySample(0)
    val (m, sy) = bySample(1)
    val t = (n.toDouble * sx + m.toDouble * sy) / (n.toDouble * m * (n + m)) -
      (4.0 * n * m - 1.0) / (6.0 * (n + m))
    val h0 = (4.0 * n * m - 1.0) / (6.0 * (n + m))
    val got = SparkEntry.queries("q506_cramer_von_mises")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq((n, m, sx, sy, snapD(t), snapD(h0))),
      s"got $got expected ${(n, m, sx, sy, snapD(t), snapD(h0))}")
  }
}
