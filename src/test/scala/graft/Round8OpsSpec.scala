package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Closed-form goldens for the round-8 operators (Shapley attribution,
  * interval-union islands, discrete-Laplace DP counts, mSPRT monitor).
  */
class Round8OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- Shapley attribution --------------------------------------------

  test("shapley: hand-computed two-channel game") {
    // u1 {A} converted     -> v({A})  = 1
    // u2 {B} not           -> v({B})  = 0
    // u3 {A,B} converted, u4 {A,B} not -> v({A,B}) = 1/2
    // phi_A = 1/2*(v(A)-0) + 1/2*(v(AB)-v(B)) = 0.5 + 0.25 = 0.75
    // phi_B = 1/2*(v(B)-0) + 1/2*(v(AB)-v(A)) = 0 - 0.25   = -0.25
    val events = Seq(
      (1L, "A"), (1L, "purchase"),
      (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "purchase"),
      (4L, "A"), (4L, "B")
    ).toDF("user_id", "event_type")
    val out = Shapley.attribution(events).collect()
    val byCh = out.map(r => r.getString(0) -> r).toMap
    assert(byCh("A").getLong(1) === 3L) // u1, u3, u4 touched A
    assert(byCh("B").getLong(1) === 3L)
    assert(byCh("A").getDouble(2) === 0.75)
    assert(byCh("B").getDouble(2) === -0.25)
  }

  test("shapley: efficiency — credits sum to v(grand coalition) when observed") {
    // every user touches both channels -> only the grand coalition is
    // observed; Shapley efficiency gives phi_A + phi_B = v({A,B})
    val events = Seq(
      (1L, "A"), (1L, "B"), (1L, "purchase"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "purchase")
    ).toDF("user_id", "event_type")
    val out = Shapley.attribution(events).collect()
    val total = out.map(_.getDouble(2)).sum
    assert(math.abs(total - 2.0 / 3.0) < 1e-9)
  }

  // ---- interval islands -----------------------------------------------

  test("coverage islands: overlap merges, gap splits, touching merges") {
    val events = Seq(
      // u1: [0,30), [10,40) overlap -> island [0,40); [100,130) separate
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:00:10"), 1L),
      (3L, ts("2024-01-01 00:01:40"), 1L),
      // u2: [0,30) and a TOUCHING [30,60) -> one island [0,60)
      (4L, ts("2024-01-01 00:00:00"), 2L),
      (5L, ts("2024-01-01 00:00:30"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = Intervals.coverageIslands(events, holdSec = 30L).collect()
    val byUser = out.map(r => r.getLong(0) -> r).toMap
    val u1 = byUser(1L)
    assert(u1.getAs[Long]("n_intervals") === 3L)
    assert(u1.getAs[Long]("n_islands") === 2L)
    assert(u1.getAs[Long]("covered_us") === 70L * 1000000L)
    assert(u1.getAs[Long]("longest_island_us") === 40L * 1000000L)
    val u2 = byUser(2L)
    assert(u2.getAs[Long]("n_islands") === 1L)
    assert(u2.getAs[Long]("covered_us") === 60L * 1000000L)
  }

  test("coverage islands: union measure never exceeds sum of intervals") {
    val events = (1 to 50).map { i =>
      (i.toLong, ts(f"2024-01-01 00:${(i * 7) % 60}%02d:${(i * 13) % 60}%02d"), (i % 3).toLong)
    }.toDF("event_id", "ts", "user_id")
    Intervals.coverageIslands(events, holdSec = 120L).collect().foreach { r =>
      val nIv = r.getAs[Long]("n_intervals")
      val covered = r.getAs[Long]("covered_us")
      assert(covered <= nIv * 120L * 1000000L)
      assert(covered >= 120L * 1000000L) // at least one interval's worth
      assert(r.getAs[Long]("longest_island_us") <= covered)
    }
  }

  // ---- DP noisy counts ------------------------------------------------

  test("dp counts: md5 leading-zero golden (engine seed contract)") {
    // md5("signup:dp") = 25f9f773 c8328bda ... ->
    //   k1 = 0x25f9f773 (bin length 30) -> G = 2; k2 even -> noise = +2
    val df = Seq.fill(7)("signup").toDF("event_type")
    val out = Pii.dpNoisyCounts(df, Seq("event_type")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("true_n") === 7L)
    assert(out.head.getAs[Long]("noise") === 2L)
    assert(out.head.getAs[Long]("released_n") === 9L)
  }

  test("dp counts: released = true + noise, deterministic across runs") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("k")
    val run1 = Pii.dpNoisyCounts(df, Seq("k")).collect().sortBy(_.getString(0))
    val run2 = Pii.dpNoisyCounts(df, Seq("k")).collect().sortBy(_.getString(0))
    assert(run1.map(_.toString).toSeq === run2.map(_.toString).toSeq)
    run1.foreach { r =>
      assert(r.getAs[Long]("released_n") === r.getAs[Long]("true_n") + r.getAs[Long]("noise"))
    }
  }

  // ---- naive Bayes ----------------------------------------------------

  test("naive bayes: separable corpus classifies itself perfectly") {
    val docs = Seq(
      (1L, "x x y", "A"), (2L, "x y", "A"),
      (3L, "z z", "B"), (4L, "z y", "B")
    ).toDF("doc_id", "text", "source")
    val out = NaiveBayes.trainEval(docs).collect()
    val byLabel = out.map(r => r.getString(0) -> r).toMap
    Seq("A", "B").foreach { c =>
      assert(byLabel(c).getAs[Long]("n_docs") === 2L)
      assert(byLabel(c).getAs[Long]("n_correct") === 2L)
      assert(byLabel(c).getAs[Double]("accuracy") === 1.0)
    }
  }

  test("naive bayes: exact score ties break toward the smallest class name") {
    // identical class profiles -> every doc scores equally for A and B
    // -> deterministic argmax picks "A" for all docs
    val docs = Seq(
      (1L, "x", "A"), (2L, "x", "B")
    ).toDF("doc_id", "text", "source")
    val out = NaiveBayes.trainEval(docs).collect()
    val byLabel = out.map(r => r.getString(0) -> r).toMap
    assert(byLabel("A").getAs[Long]("n_correct") === 1L)
    assert(byLabel("B").getAs[Long]("n_correct") === 0L)
  }

  // ---- label noise ----------------------------------------------------

  test("label noise: planted mislabel lands in its (label, pred) cell") {
    val docs = Seq(
      (1L, "x x x", "A"), (2L, "x x", "A"), (3L, "x x x x", "A"),
      (4L, "z z z", "B"), (5L, "z z", "B"),
      (6L, "z z z z", "A") // mislabeled: clearly class B
    ).toDF("doc_id", "text", "source")
    val out = NaiveBayes.labelNoise(docs, minMargin = 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "A") // recorded label
    assert(out.head.getString(1) === "B") // model's verdict
    assert(out.head.getAs[Long]("n_confident") === 1L)
    assert(out.head.getAs[Double]("mean_margin") > 0.5)
  }

  test("label noise: clean separable corpus reports no confident cells") {
    val docs = Seq(
      (1L, "x x", "A"), (2L, "x x x", "A"),
      (3L, "z z", "B"), (4L, "z z z", "B")
    ).toDF("doc_id", "text", "source")
    assert(NaiveBayes.labelNoise(docs).count() === 0L)
  }

  // ---- IPS off-policy -------------------------------------------------

  test("ips: hand-computed single-context bandit replay") {
    // hour 0: action 'a' pays 1.00 twice, action 'b' pays 0.00 twice
    // greedy pi(0) = 'a'; p(a|0) = 1/2
    // V_ips = (1/4) * 2 * (1.00 / 0.5) = 1.0 ; logged mean = 0.5
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-01 00:20:00"), 2L, "a", 1.0),
      (3L, ts("2024-01-01 00:30:00"), 3L, "b", 0.0),
      (4L, ts("2024-01-01 00:40:00"), 4L, "b", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Eval.ipsOffPolicy(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_contexts") === 1L)
    assert(r.getAs[Double]("match_rate") === 0.5)
    assert(r.getAs[Double]("logged_value") === 0.5)
    assert(r.getAs[Double]("ips_value") === 1.0)
  }

  // ---- bucketed layout ------------------------------------------------

  test("bucketed probe reads only matching bucket directories") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("graft_bucket_spec").resolve("t").toString
    val df = (1L to 2000L).map(i => (i, i * 3)).toDF("k", "v")
    graft.sources.LakeWriter.writeBucketed(df, path, "k", numBuckets = 8)
    val allFiles = spark.read.parquet(path).inputFiles
    assert(allFiles.map(f => f.substring(f.indexOf("__bucket="))).distinct.length === 8)
    val keys = Seq(5L, 10L, 15L)
    val probe = graft.sources.LakeWriter.readBucketedProbe(spark, path, "k", keys, 8)
    // correctness: exactly the probed keys come back
    assert(probe.select("k").collect().map(_.getLong(0)).sorted === keys.sorted.toArray)
    // pruning: the bucket IN-list is a PartitionFilter on the scan (the
    // PlanAuditSpec idiom — inputFiles is pre-filter, so not usable here)
    val plan = probe.queryExecution.executedPlan.toString
    val pf = """PartitionFilters: \[[^\]]*\]""".r.findFirstIn(plan)
    assert(pf.exists(_.contains("__bucket")),
      s"bucket predicate not pushed to PartitionFilters: $pf")
    // and the pruned scan really reads fewer files than the full table
    val expectBuckets = keys.toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8L)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(expectBuckets.size < 8)
    val prunedCount = spark.read.parquet(path)
      .filter(col("__bucket").isin(expectBuckets.toSeq: _*))
      .count()
    val fullCount = spark.read.parquet(path).count()
    assert(prunedCount < fullCount)
  }

  // ---- hilbert layout -------------------------------------------------

  test("hilbertValue matches the reference xy2d transform and is a bijection") {
    import org.apache.spark.sql.functions._
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      var x = x0; var y = y0; var d = 0L; var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val bits = 3
    val n = 1 << bits
    val cells = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val df = cells.toDF("x", "y")
      .withColumn("d", graft.sources.LakeWriter.hilbertValue(col("x"), col("y"), bits))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cells.foreach { case (x, y) => assert(got((x, y)) === ref(bits, x, y)) }
    assert(got.values.toSeq.sorted === (0L until (n.toLong * n)).toSeq)
    // the locality property that justifies the curve: consecutive curve
    // positions are always grid-ADJACENT (Manhattan distance 1)
    val byD = got.toSeq.map { case ((x, y), d) => d -> (x, y) }.sortBy(_._1).map(_._2)
    byD.zip(byD.tail).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
  }

  // ---- haar energy ----------------------------------------------------

  test("haar energy: hand-computed two-level pyramid") {
    // hourly counts 1,3,2,2 -> level1 details (1-3, 2-2) = (-2, 0),
    // energy 4; level2 detail (1+3)-(2+2) = 0, energy 0
    val events = (
      (1 to 1).map(i => (i.toLong, ts("2024-01-01 00:10:00"), 1L)) ++
        (1 to 3).map(i => (10L + i, ts("2024-01-01 01:10:00"), 1L)) ++
        (1 to 2).map(i => (20L + i, ts("2024-01-01 02:10:00"), 1L)) ++
        (1 to 2).map(i => (30L + i, ts("2024-01-01 03:10:00"), 1L))
      ).toDF("event_id", "ts", "user_id")
    val out = Timeseries.haarEnergy(events, maxLevel = 2).collect()
      .map(r => r.getAs[Long]("level") -> r).toMap
    assert(out(1L).getAs[Long]("n_blocks") === 2L)
    assert(out(1L).getAs[Long]("energy") === 4L)
    assert(out(2L).getAs[Long]("n_blocks") === 1L)
    assert(out(2L).getAs[Long]("energy") === 0L)
  }

  // ---- FIFO matching --------------------------------------------------

  test("fifo match: cumulative-interval identity equals the literal queue walk") {
    def walk(sup: Seq[Long], dem: Seq[Long]): Long = {
      // literal two-pointer FIFO walk
      var si = 0; var di = 0
      var sRem = if (sup.nonEmpty) sup.head else 0L
      var dRem = if (dem.nonEmpty) dem.head else 0L
      var m = 0L
      while (si < sup.length && di < dem.length) {
        val take = math.min(sRem, dRem)
        m += take; sRem -= take; dRem -= take
        if (sRem == 0) { si += 1; if (si < sup.length) sRem = sup(si) }
        if (dRem == 0) { di += 1; if (di < dem.length) dRem = dem(di) }
      }
      m
    }
    val cases = Seq(
      (Seq(5L, 4L), Seq(3L, 4L)),   // surplus supply
      (Seq(3L), Seq(5L, 4L)),       // scarce supply
      (Seq(2L, 2L, 2L), Seq(6L)),   // one demand spans many supplies
      (Seq(7L), Seq(1L, 1L, 1L)))   // one supply feeds many demands
    cases.zipWithIndex.foreach { case ((sup, dem), k) =>
      val supDf = sup.zipWithIndex.map { case (q, i) => (k.toLong, i.toLong, q) }
        .toDF("key", "ord", "q")
      val demDf = dem.zipWithIndex.map { case (q, i) => (k.toLong, i.toLong, q) }
        .toDF("key", "ord", "q")
      val got = Intervals.fifoMatch(supDf, demDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.getOrElse(k.toLong, 0L) === walk(sup, dem), s"case $k")
    }
  }

  // ---- lake vacuum ----------------------------------------------------

  test("vacuum: expires versions, deletes orphans, keeps the live snapshot intact") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_vacuum_spec").resolve("t").toString
    graft.sources.LakeLog.overwrite(Seq((1L, "a")).toDF("k", "s").coalesce(1), path)
    graft.sources.LakeLog.overwrite(Seq((2L, "b")).toDF("k", "s").coalesce(1), path)
    graft.sources.LakeLog.append(Seq((3L, "c")).toDF("k", "s").coalesce(1), path)
    assert(graft.sources.LakeLog.versions(path) === Seq(1L, 2L, 3L))
    val (expired, orphans) = graft.sources.LakeLog.vacuum(path, keepLast = 1)
    assert(expired === 2)
    assert(orphans === 1) // v1's file; v2's file is carried into v3 by the append
    // live snapshot unchanged
    val rows = graft.sources.LakeLog.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows === Array((2L, "b"), (3L, "c")))
    // expired version is gone
    intercept[IllegalArgumentException] {
      graft.sources.LakeLog.read(spark, path, version = 1L).collect()
    }
    // idempotent
    assert(graft.sources.LakeLog.vacuum(path, keepLast = 1) === ((0, 0)))
  }

  // ---- jenks breaks ---------------------------------------------------

  test("jenks: four well-separated clusters are recovered exactly") {
    val vals = (Seq(1L, 2L, 3L) ++ Seq(100L, 101L) ++ Seq(200L, 201L, 202L) ++ Seq(300L))
      .toDF("v")
    val out = Jenks.naturalBreaks4(vals, binWidth = 1L).collect()
      .map(r => r.getAs[Long]("class") -> r).toMap
    assert(out.size === 4)
    assert(out(1L).getAs[Long]("n_rows") === 3L) // {1,2,3}
    assert(out(2L).getAs[Long]("n_rows") === 2L) // {100,101}
    assert(out(3L).getAs[Long]("n_rows") === 3L) // {200,201,202}
    assert(out(4L).getAs[Long]("n_rows") === 1L) // {300}
    assert(out(1L).getAs[Double]("mean") === 2.0)
    assert(out(4L).getAs[Double]("mean") === 300.0)
    assert(out(2L).getAs[Long]("lo_edge") === 100L)
  }

  // ---- burst viterbi --------------------------------------------------

  test("burst viterbi: planted 3-hour burst decodes as one burst episode") {
    var id = 0L
    val events = (0 until 23).flatMap { h =>
      val c = if (h >= 10 && h <= 12) 30 else 2
      (1 to c).map { _ =>
        id += 1
        (id, ts(f"2024-01-01 $h%02d:30:00"), 1L)
      }
    }.toDF("event_id", "ts", "user_id")
    val out = Timeseries.burstViterbi(events).collect()
      .map(r => r.getAs[Long]("state") -> r).toMap
    assert(out.contains(1L), "burst state never fired")
    assert(out(1L).getAs[Long]("n_hours") === 3L)
    assert(out(1L).getAs[Long]("n_episodes") === 1L)
    assert(out(1L).getAs[Long]("total_events") === 90L)
    assert(out(0L).getAs[Long]("n_hours") === 20L)
  }

  test("burst viterbi: flat series stays entirely in baseline") {
    val events = (0 until 24).flatMap { h =>
      (1 to 5).map(i => (h * 10L + i, ts(f"2024-01-01 $h%02d:15:00"), 1L))
    }.toDF("event_id", "ts", "user_id")
    val out = Timeseries.burstViterbi(events).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("state") === 0L)
    assert(out.head.getAs[Long]("n_hours") === 24L)
  }

  // ---- clamped balance ------------------------------------------------

  test("clamped balance: reflecting-barrier identity equals the sequential fold") {
    // nets +5, -10, +3, -1 -> sequential clamp levels 5, 0, 3, 2
    val flows = Seq(
      (1L, 1L, 5L), (1L, 2L, -10L), (1L, 3L, 3L), (1L, 4L, -1L)
    ).toDF("key", "day", "dnet")
    val out = Timeseries.clampedBalance(flows).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("final_raw") === -3L)
    assert(r.getAs[Long]("final_level") === 2L)
    assert(r.getAs[Long]("peak_level") === 5L)
    // property: identity ≡ fold on pseudorandom walks
    val walk = (1 to 60).map(i => (2L, i.toLong, ((i * 37) % 21 - 10).toLong))
    val seqLevels = walk.map(_._3).scanLeft(0L)((l, d) => math.max(0L, l + d)).drop(1)
    val got = Timeseries.clampedBalance(walk.toDF("key", "day", "dnet")).collect().head
    assert(got.getAs[Long]("final_level") === seqLevels.last)
    assert(got.getAs[Long]("peak_level") === seqLevels.max)
  }

  // ---- mSPRT ----------------------------------------------------------

  test("msprt: planted massive effect rejects; p is non-increasing") {
    // arm = user_id % 2: even users (arm 0) value 100, odd (arm 1) value 1
    val events = (1 to 600).map { i =>
      val uid = (i % 60).toLong
      val day = i % 3
      (i.toLong, ts(f"2024-01-0${day + 1}%d 12:00:00"), uid,
        if (uid % 2 == 0) 100.0 else 1.0)
    }.toDF("event_id", "ts", "user_id", "value")
    val out = Eval.msprtDaily(events).orderBy("day_idx").collect()
    assert(out.length === 3)
    val ps = out.map(_.getAs[Double]("p_always_valid"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(out.last.getAs[Boolean]("reject"))
    assert(out.last.getAs[Double]("mean_diff") > 90.0)
  }

  test("msprt: A/A with zero variance is guarded (no NaN, never rejects)") {
    val events = (1 to 200).map { i =>
      (i.toLong, ts("2024-01-01 12:00:00"), (i % 20).toLong, 5.0)
    }.toDF("event_id", "ts", "user_id", "value")
    val out = Eval.msprtDaily(events).collect()
    assert(out.length === 1)
    assert(!out.head.getAs[Double]("log_lambda").isNaN)
    assert(!out.head.getAs[Boolean]("reject"))
    assert(out.head.getAs[Double]("p_always_valid") === 1.0)
  }
}
