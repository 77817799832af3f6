package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingHash64, VectorOps}
import graft.operators._

/** Behavior tests for the LLM-pipeline operators on crafted inputs (the
  * lake-scale runs are oracle-checked by Verify + DuckDB).
  */
class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("CMS heavy hitters: estimate >= true count, exact under no collision") {
    val d = (1 to 100).map(i => (i.toLong, if (i <= 60) "hot" else s"cold$i"))
      .toDF("id", "key")
    val hh = CountMin.heavyHitters(d, "key", d = 4, w = 256, topK = 5).collect()
    assert(hh.nonEmpty)
    hh.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"),
        s"CMS underestimated ${r.getAs[String]("key")}")
    }
    // 41 distinct keys in 4x256 buckets: the hot key's 4 counters are
    // collision-free with overwhelming odds -> min is the exact count.
    val hot = hh.find(_.getAs[String]("key") == "hot").get
    assert(hot.getAs[Long]("true_cnt") == 60L && hot.getAs[Long]("cms_est") == 60L)
  }

  test("cms counters: shard merge by summing == whole-data probe estimates") {
    val ev = (1 to 300).map(i => (i % 7).toLong).toDF("k")
    def counters(d: org.apache.spark.sql.DataFrame) = d
      .select(col("k"), explode(sequence(lit(0), lit(3))).as("j"))
      .select(col("j"), CountMin.bucketCol(col("j"), col("k"), 256).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
    val merged = counters(ev.filter(col("k") <= 3))
      .unionAll(counters(ev.filter(col("k") > 3)))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val probes = ev.groupBy("k").agg(count(lit(1)).as("true_cnt"))
    val whole = CountMin.probeCounters(counters(ev), probes, "k", 4, 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val shard = CountMin.probeCounters(merged, probes, "k", 4, 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(whole == shard && whole.size == 7)
    // 7 keys in 4x256 buckets: collision-free, so est is exactly true
    whole.values.foreach { case (t, est) => assert(est == t) }
  }

  test("hll sketch: multiset-invariant, exact count right, estimate in 3-sigma") {
    val base = (1 to 2000).map(i => ("g", i.toLong)).toDF("grp", "k")
    val dup = base.union(base).union(base)
    val a = Hll.distinctSketch(base, "grp", "k").collect().head
    val b = Hll.distinctSketch(dup, "grp", "k").collect().head
    // The sketch sees DISTINCT keys: duplicating every row changes nothing.
    assert(a == b)
    assert(a.getAs[Long]("exact_distinct") == 2000L)
    // m=512 -> relative error sigma = 1.04/sqrt(512) = 4.6%; 15% = 3 sigma
    // (and the inputs are md5-fixed, so this is deterministic, not flaky).
    assert(math.abs(a.getAs[Double]("hll_est") - 2000.0) / 2000.0 < 0.15)
  }

  test("hll registers: shard merge by max(rho) == whole-data sketch estimate") {
    val df = (1 to 3000).map(i => ("g", i.toLong)).toDF("grp", "k")
    val keyStr = col("k").cast("string")
    def regs(d: org.apache.spark.sql.DataFrame) = d
      .select(col("grp"), Hll.bucketCol(keyStr, 512).as("bucket"),
        Hll.rhoCol(keyStr).as("mj"))
      .groupBy("grp", "bucket").agg(max("mj").as("mj"))
    // Two shards sketched independently, merged register-wise by max.
    val merged = regs(df.filter(col("k") <= 1500)).unionAll(regs(df.filter(col("k") > 1500)))
      .groupBy("grp", "bucket").agg(max("mj").as("mj"))
    val whole = Hll.estimateFromRegisters(regs(df), "grp", 512).collect().head
    val shard = Hll.estimateFromRegisters(merged, "grp", 512).collect().head
    assert(whole == shard)
    // and the register-path estimate agrees with the one-call facade
    val facade = Hll.distinctSketch(df, "grp", "k").collect().head
    assert(whole.getAs[Double]("hll_est") == facade.getAs[Double]("hll_est"))
    assert(whole.getAs[Int]("v_zero") == facade.getAs[Int]("v_zero"))
  }

  test("compactLog: head change wins, tombstone erases, reinsert resurrects") {
    val log = Seq(
      (1L, 1, "I", "a"), (1L, 2, "U", "b"),             // live: b
      (2L, 1, "I", "x"), (2L, 2, "D", ""),              // erased
      (3L, 1, "I", "p"), (3L, 2, "D", ""), (3L, 3, "I", "q") // resurrected: q
    ).toDF("k", "seq", "op", "v")
    val got = Changelog.compactLog(log, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(3))).toMap
    assert(got == Map(1L -> (2, "b"), 3L -> (3, "q")))
  }

  test("largestRemainderAlloc: exact budget, floors + largest fractions") {
    // counts 7, 2, 1 of total 10; budget 7 -> quotas 4.9, 1.4, 0.7
    val df = (Seq.fill(7)("a") ++ Seq.fill(2)("b") ++ Seq.fill(1)("c")).toDF("g")
    val got = Sampling.largestRemainderAlloc(df, "g", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // bases 4,1,0 (sum 5), two remainders to the largest fracs: a (.9), c (.7)
    assert(got == Map("a" -> 5L, "b" -> 1L, "c" -> 1L))
    assert(got.values.sum == 7L)
    // uniform counts: fractions tie, name tie-break decides deterministically
    val u = (Seq.fill(3)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z")).toDF("g")
    val gu = Sampling.largestRemainderAlloc(u, "g", 4L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gu == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
  }

  test("ewma: closed-form truncated normalized weights, window cut, key isolation") {
    val ts = Seq(
      ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
      ("b", 1, 10.0)
    ).toDF("k", "t", "v")
    val got = Timeseries.ewma(ts, Seq("k"), Seq("t"), "v", alpha = 0.5, window = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // a@1: [1] -> 1; a@2: (0.5*1+2)/1.5; a@3 window drops v=1: (0.5*2+3)/1.5
    assert(got(("a", 1)) == 1.0)
    assert(got(("a", 2)) == 1.666667)
    assert(got(("a", 3)) == 2.666667)
    assert(got(("b", 1)) == 10.0) // other keys never leak into the slice
  }

  test("rocAuc: separation, ties, and missing-class groups") {
    val df = Seq(
      // g1: perfect separation -> 1.0
      ("g1", 3, 1L), ("g1", 4, 1L), ("g1", 1, 0L), ("g1", 2, 0L),
      // g2: scores identical across classes -> midranks give 0.5
      ("g2", 1, 1L), ("g2", 2, 1L), ("g2", 1, 0L), ("g2", 2, 0L),
      // g3: one class only -> dropped
      ("g3", 5, 1L)
    ).toDF("g", "score", "y")
    val got = Eval.rocAuc(df, "g", "score", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == Map("g1" -> 1.0, "g2" -> 0.5))
  }

  test("mutualInformation: ln(2) for a perfect predictor, 0 for independence") {
    val df = Seq(
      (true, false, true), (true, false, true),
      (false, true, false), (false, true, false)
    ).toDF("same", "anti", "y") // "anti" is also perfectly informative
    val ind = Seq(
      (true, true), (true, false), (false, true), (false, false)
    ).toDF("f", "y")
    val got = Eval.mutualInformation(df, Seq("same", "anti"), "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("same") == 0.693147 && got("anti") == 0.693147)
    val gotInd = Eval.mutualInformation(ind, Seq("f"), "y").collect()
    assert(gotInd.head.getDouble(2) == 0.0)
  }

  test("benfordDigits: exact digit extraction and chi2 addends") {
    val df = Seq(123.45, 19.99, 1.01, 950.0, 0.0, -5.0).toDF("v")
    val got = Checks.benfordDigits(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 0 and negatives excluded; first digits of cents-exact values
    assert(got == Map(1 -> 3L, 9 -> 1L))
    val row1 = Checks.benfordDigits(df, "v").filter($"digit" === 1).head()
    assert(row1.getDouble(2) == 0.30103) // log10(2) rounded
  }

  test("retentionMatrix: closed-form cohorts, offsets, and ratios") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-08 10:00:00"), // w0, w1
      (2L, "2024-01-02 10:00:00"),                              // w0 only
      (3L, "2024-01-10 10:00:00"), (3L, "2024-01-10 11:00:00")  // w1 cohort, dup-day
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Sessionize.retentionMatrix(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((2L, 2L, 1.0)),  // both w0 users active in w0
      ("2024-01-01", 1) -> ((1L, 2L, 0.5)),  // only user 1 returns
      ("2024-01-08", 0) -> ((1L, 1L, 1.0))))
  }

  test("calibrationBins: exact bin stats and gaps") {
    val df = Seq((0.05, 0L), (0.05, 1L), (0.95, 1L), (0.95, 1L), (0.95, 0L))
      .toDF("p", "y")
    val got = Eval.calibrationBins(df, "p", "y")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0) == ((2L, 0.05, 0.5)))
    assert(got(9) == ((3L, 0.95, 0.666667)))
  }

  test("pca: exact closed-form component and projections on a collinear cloud") {
    // points on the (2,1) line: covariance is rank-1, power iteration is
    // exact on the 2^-20 grid, so every value below is closed-form.
    val pts = Seq(
      (0L, Array(2.0f, 1.0f)), (1L, Array(4.0f, 2.0f)),
      (2L, Array(6.0f, 3.0f)), (3L, Array(-2.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Pca.topComponent(pts, iters = 4, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got(("load", 0L)) == 1.0)   // max-norm: dominant dim pinned to 1
    assert(got(("load", 1L)) == 0.5)   // direction (2,1) -> (1, 0.5)
    assert(got(("proj", 2L)) == 4.375) // centered (3.5,1.75)·(1,0.5)
    assert(got(("proj", 1L)) == 1.875)
    assert(!got.contains(("proj", 0L))) // topK=2 cut
  }

  test("hits: closed-form hub/authority scores on a tiny bipartite graph") {
    // u1 -> {p1, p2}, u2 -> {p1}
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("src", "dst")
    val got = Graph.hits(e, iters = 2, topK = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // iter1: a=(2,1)->norm (1,0.5); h=(1.5,1)->norm (1,2/3)
    // iter2: a=(5/3,1)->norm (1,0.6); h=(1.6,1)->norm (1,0.625)
    assert(got(("auth", 101L)) == 1.0 && math.abs(got(("auth", 102L)) - 0.6) < 1e-6)
    assert(got(("hub", 1L)) == 1.0 && math.abs(got(("hub", 2L)) - 0.625) < 1e-6)
  }

  test("pareto2d: closed-form front, duplicates survive, equals brute-force dominance") {
    val pts = Seq((1L, 1.0, 1), (2L, 1.0, 2), (3L, 2.0, 3), (4L, 3.0, 3),
      (5L, 2.0, 2), (6L, 1.0, 2)).toDF("id", "cost", "ben")
    val got = Skyline.pareto2d(pts, "cost", "ben")
      .select("id").as[Long].collect().toSet
    // (1,2) twice (ids 2 and 6: both stay -- ties dominate nothing), (2,3)
    assert(got == Set(2L, 3L, 6L))
    // pseudo-random cloud: must equal the quadratic dominance definition
    val cloud = (1 to 200).map { i =>
      val h = (i * 2654435761L) & 0xffffL
      (i.toLong, (h % 50).toDouble, ((h / 64) % 37).toInt)
    }.toDF("id", "cost", "ben")
    val fast = Skyline.pareto2d(cloud, "cost", "ben")
      .select("id").as[Long].collect().toSet
    val a = cloud.select(col("id"), col("cost"), col("ben"))
    val b = cloud.select(col("id").as("id2"), col("cost").as("cost2"), col("ben").as("ben2"))
    val dominated = a.join(b,
      col("cost2") <= col("cost") && col("ben2") >= col("ben") &&
        (col("cost2") < col("cost") || col("ben2") > col("ben")))
      .select("id").as[Long].collect().toSet
    val brute = cloud.select("id").as[Long].collect().toSet -- dominated
    assert(fast == brute)
  }

  test("associationRules: support prune, duplicate items collapse, closed-form lift") {
    val tx = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), // duplicate x collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "z"),
      (4L, "z")
    ).toDF("bk", "it")
    val got = Cooccur.associationRules(tx, "bk", "it", minSupport = 2).collect()
    assert(got.length == 1) // (x,z) and (y,z) have support 1 -> pruned
    val r = got.head
    assert(r.getAs[String]("item_a") == "x" && r.getAs[String]("item_b") == "y")
    assert(r.getAs[Long]("supp") == 3L)
    assert(r.getAs[Double]("conf_ab") == 1.0 && r.getAs[Double]("conf_ba") == 1.0)
    // lift = supp * n_baskets / (supp_a * supp_b) = 3*4/9
    assert(math.abs(r.getAs[Double]("lift") - 1.333333) < 1e-6)
  }

  test("seasonalAnomalies: planted spike flagged, flat and short-history hours not") {
    def ev(day: Int, hr: Int, minute: Int) =
      (f"2024-01-$day%02d $hr%02d:$minute%02d:00", "t")
    // hour 3: ten days of one event, day 11 spikes to ten events
    val spike = (1 to 11).map(d => ev(d, 3, 0)) ++ (1 to 9).map(m => ev(11, 3, m))
    // hour 5: constant across four days -> sigma = 0, never flagged
    val flat = (1 to 4).map(d => ev(d, 5, 0))
    // hour 7: wild but only two days of history -> below minDays
    val short = Seq(ev(1, 7, 0)) ++ (0 to 8).map(m => ev(2, 7, m))
    val events = (spike ++ flat ++ short).toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
    val got = Drift.seasonalAnomalies(events).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Int]("hr") == 3 && r.getAs[Long]("cnt") == 10L)
    // counts [1x10, 10]: mu = 20/11, sigma = sqrt((110 - 20/11*20)/10)
    val mu = 20.0 / 11
    val sigma = math.sqrt((110 - 20.0 / 11 * 20) / 10)
    assert(math.abs(r.getAs[Double]("z") - (10 - mu) / sigma) < 1e-5)
  }

  test("kneserNeyLogProb: closed-form discount + continuation back-off") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cb: (a,b)=2 (b,a)=1 (a,c)=1; c_l(a)=3 N1+(a.)=2; c_l(b)=1 N1+(b.)=1
    // N1+(.b)=1 N1+(.a)=1 N1+(.c)=1; types=3; D=0.75
    val pba = (2 - 0.75) / 3.0 + (0.75 * 2 / 3.0) * (1.0 / 3)
    val pab = (1 - 0.75) / 1.0 + (0.75 * 1 / 1.0) * (1.0 / 3)
    val pca = (1 - 0.75) / 3.0 + (0.75 * 2 / 3.0) * (1.0 / 3)
    val d1 = BigDecimal((math.log(pba) * 2 + math.log(pab)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = BigDecimal(math.log(pca))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - d1) < 2e-6)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - d2) < 2e-6)
  }

  test("kCore: K4 survives a 3-core peel, tails drop; cycle is its own 2-core") {
    // K4 on 1..4 plus a tail 4-5-6 (degrees 2 and 1)
    val k4 = for { a <- 1 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a 5-cycle has uniform degree 2: fully its own 2-core, untouched
    val cyc = (1 to 5).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("src", "dst")
    val c2 = Graph.kCore(cyc, k = 2, rounds = 3).collect()
    assert(c2.length == 5 && c2.forall(_.getLong(1) == 2L))
    // ...and a 3-core peel erases it entirely
    assert(Graph.kCore(cyc, k = 3, rounds = 3).count() == 0L)
  }

  test("kmv: exact below k, closed-form jaccard, identical sets fuse to J=1") {
    val rows = (1 to 20).map(i => ("A", i.toLong)) ++
      (11 to 30).map(i => ("B", i.toLong)) ++
      (100 to 105).map(i => ("C", i.toLong))
    val got = Kmv.pairIntersections(rows.toDF("s", "k"), "s", "k", k = 64)
      .collect()
      .map(r => (r.getAs[String]("set_a"), r.getAs[String]("set_b")) -> r).toMap
    // every set is smaller than k: the sketch IS the set, all estimates exact
    val ab = got(("A", "B"))
    assert(ab.getAs[Double]("est_a") == 20.0 && ab.getAs[Double]("est_b") == 20.0)
    assert(ab.getAs[Double]("est_union") == 30.0)
    assert(ab.getAs[Long]("n_both") == 10L && ab.getAs[Long]("exact_inter") == 10L)
    assert(ab.getAs[Double]("est_inter") == 10.0)
    assert(math.abs(ab.getAs[Double]("jaccard_est") - 10.0 / 30.0) < 1e-6)
    val ac = got(("A", "C"))
    assert(ac.getAs[Long]("n_both") == 0L && ac.getAs[Double]("est_inter") == 0.0)
    // identical sets, k smaller than the sets: every union survivor is in
    // both sketches -> J estimated exactly 1, est_inter == est_union
    val big = (1 to 200).flatMap(i => Seq(("D", i.toLong), ("E", i.toLong)))
    val de = Kmv.pairIntersections(big.toDF("s", "k"), "s", "k", k = 16)
      .collect().head
    assert(de.getAs[Double]("jaccard_est") == 1.0)
    assert(de.getAs[Double]("est_inter") == de.getAs[Double]("est_union"))
    assert(de.getAs[Long]("exact_inter") == 200L)
  }

  test("sqrtSourceCap: sublinear cap, minKeep floor, quality-first retention") {
    val docs = ((1 to 5).map(i => (i.toLong, "a", i.toLong * 100)) ++
      Seq((10L, "b", 700L), (11L, "b", 800L)))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.sqrtSourceCap(docs, c = 1.0, minKeep = 0L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // source a: cap = ceil(sqrt(5)) = 3, keeps the 3 LONGEST (500+400+300)
    assert(got("a").getAs[Long]("cap") == 3L)
    assert(got("a").getAs[Long]("n_kept") == 3L)
    assert(got("a").getAs[Long]("chars_kept") == 1200L)
    assert(got("a").getAs[Double]("kept_frac") == 0.8)
    // source b: cap = ceil(sqrt(2)) = 2 >= size, everything survives
    assert(got("b").getAs[Long]("n_kept") == 2L && got("b").getAs[Double]("kept_frac") == 1.0)
    // minKeep floors the cap for every source
    val floored = Sampling.sqrtSourceCap(docs, c = 1.0, minKeep = 4L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("cap")).toMap
    assert(floored == Map("a" -> 4L, "b" -> 4L))
  }

  test("weighted sample: exact n, heavy weight always drawn, nonpositive excluded") {
    val d = ((1 to 400).map(i => (i.toLong, 1.0)) :+ (1000L, 1e9) :+ (1001L, 0.0) :+ (1002L, -5.0))
      .toDF("id", "w")
    val s = Sampling.weightedSample(d, "id", "w", n = 50).collect()
    assert(s.length == 50)
    val ids = s.map(_.getAs[Long]("id")).toSet
    // key = -ln(u)/1e9 is ~1e9 times smaller than any unit-weight key
    assert(ids.contains(1000L), "heavy-weight row not drawn")
    assert(!ids.contains(1001L) && !ids.contains(1002L), "nonpositive weight drawn")
    // Deterministic: same call, same sample
    assert(Sampling.weightedSample(d, "id", "w", n = 50).collect().map(_.getAs[Long]("id")).toSet == ids)
  }

  test("ks drift: disjoint supports give D=1, identical distributions give D=0") {
    val a = (1 to 50).map(i => ("a", i.toLong))
    val b = (101 to 150).map(i => ("b", i.toLong))
    val disjoint = (a ++ b).toDF("g", "v")
    val ks1 = Drift.ksVsRest(disjoint, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("ks_vs_rest")).toMap
    assert(ks1 == Map("a" -> 1.0, "b" -> 1.0))
    val same = ((1 to 50).map(i => ("a", i.toLong)) ++ (1 to 50).map(i => ("b", i.toLong)))
      .toDF("g", "v")
    val ks0 = Drift.ksVsRest(same, "g", "v").collect()
      .map(r => r.getAs[Double]("ks_vs_rest"))
    assert(ks0.forall(_ == 0.0))
  }

  test("mad outliers: planted spike counted, clean group zero, closed-form med/mad") {
    // Group "t": values 1..9 plus a spike 1000. med of 10 values = 5.5,
    // adev = {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} -> mad = 2.5;
    // threshold 3*1.4826*2.5 = 11.1195 -> only the spike exceeds it.
    val t = ((1 to 9).map(i => ("t", i.toDouble)) :+ ("t", 1000.0))
    val c = (1 to 10).map(i => ("c", i.toDouble))
    val r = Drift.madOutliers((t ++ c).toDF("g", "v"), "g", "v").collect()
      .map(x => x.getAs[String]("g") ->
        (x.getAs[Long]("n"), x.getAs[Double]("med"), x.getAs[Double]("mad"),
          x.getAs[Long]("n_outliers"))).toMap
    assert(r("t") == ((10L, 5.5, 2.5, 1L)))
    assert(r("c") == ((10L, 5.5, 2.5, 0L)))
  }

  test("label propagation: cliques converge to min label in 3 rounds") {
    val edges = Seq(
      // K4 on 1..4 and a triangle on 10..12, disjoint
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L)
    ).toDF("src", "dst")
    val r = Graph.labelPropagation(edges, iters = 3).collect()
      .map(x => x.getAs[Long]("label") ->
        (x.getAs[Long]("size"), x.getAs[Long]("min_node"))).toMap
    assert(r == Map(1L -> ((4L, 1L)), 10L -> ((3L, 10L))))
  }

  test("node jaccard: square opposite corners share both neighbors, path endpoints one") {
    // Square 1-2-3-4-1: pairs (1,3) and (2,4) have common=2, union=2 -> 1.0
    // Path 20-21-22: (20,22) common=1 over union=1 -> 1.0; adjacent pairs
    // share nothing.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (20L, 21L), (21L, 22L)
    ).toDF("src", "dst")
    val r = Graph.nodeJaccard(edges, topK = 20).collect()
      .map(x => (x.getAs[Long]("node_a"), x.getAs[Long]("node_b"),
        x.getAs[Long]("common"), x.getAs[Double]("jaccard"))).toSet
    assert(r == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0), (20L, 22L, 1L, 1.0)))
  }

  test("rrf fusion: overlap doc wins, reciprocal sums exact") {
    val l1 = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val l2 = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val r = Retrieval.rrfFuse(Seq(l1, l2), "doc_id", k0 = 60, topK = 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L, 3L))
    val byDoc = r.map(x => x.getAs[Long]("doc_id") ->
      (x.getAs[Long]("n_lists"), x.getAs[Double]("rrf"))).toMap
    assert(byDoc(2L)._1 == 2L)
    assert(math.abs(byDoc(2L)._2 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
    assert(math.abs(byDoc(1L)._2 - 1.0 / 61) < 1e-6)
    assert(math.abs(byDoc(3L)._2 - 1.0 / 62) < 1e-6)
  }

  test("ddsketch: every estimate within alpha of the rank-r order statistic") {
    // Log-spaced values spanning 4 decades exercise many bins.
    val vals = (1 to 500).map(i => math.exp(i / 50.0))
    val d = vals.map(("g", _)).toDF("g", "v")
    val r = DdSketch.quantiles(d, "g", "v").collect().head
    val sorted = vals.sorted
    def rankStat(q: Double): Double = sorted((q * (sorted.length - 1)).floor.toInt + 1 - 1)
    for ((qn, q) <- Seq(("p50_est", 0.5), ("p95_est", 0.95), ("p99_est", 0.99))) {
      val est = r.getAs[Double](qn)
      val truth = rankStat(q)
      assert(math.abs(est / truth - 1.0) <= 0.02001,
        s"$qn: $est vs rank stat $truth exceeds alpha")
    }
    assert(r.getAs[Long]("n") == 500L)
  }

  test("bigram LM: deterministic corpus gives closed-form interpolated score") {
    // Corpus = one doc "a b a b a": bigrams ab, ba, ab, so
    // c(a,b)=2, c(b,a)=1, c(a·)=2, c(b·)=1 wait: lefts are a,b,a,b -> c_l(a)=2, c_l(b)=2.
    // unigrams: a:3, b:2, total 5.
    // P(b|a)=2/2=1... recompute: bigrams of [a,b,a,b,a] = (a,b),(b,a),(a,b),(b,a):
    // c_b(a,b)=2, c_b(b,a)=2, c_l(a)=2, c_l(b)=2.
    // score(a,b) = ln(0.7*(2/2) + 0.3*(2/5)) = ln(0.82)
    // score(b,a) = ln(0.7*(2/2) + 0.3*(3/5)) = ln(0.88)
    val d = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(d).collect().head
    assert(r.getAs[Long]("n_bigrams") == 4L)
    val expected = (2 * math.log(0.7 + 0.3 * 2.0 / 5) + 2 * math.log(0.7 + 0.3 * 3.0 / 5)) / 4
    assert(math.abs(r.getAs[Double]("mean_ll") - expected) < 1e-6)
  }

  test("char entropy: uniform chars maximal, single char zero") {
    val d = Seq((1L, "aaaa"), (2L, "abcd")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_chars_counted"), x.getAs[Double]("entropy"))).toMap
    assert(r(1L) == ((4L, 0.0)))
    assert(math.abs(r(2L)._2 - math.log(4.0)) < 1e-6)
  }

  test("semantic decontam: planted near-copy flagged with worst hit, far vectors clean") {
    val rng = new scala.util.Random(11)
    val ev = Array.fill(64)(rng.nextGaussian().toFloat)
    val corpus = Seq(
      (100L, ev.clone()), // exact copy of eval vec 0 -> cosine 1.0
      (101L, Array.fill(64)(rng.nextGaussian().toFloat)),
      (102L, Array.fill(64)(rng.nextGaussian().toFloat))
    ).toDF("vec_id", "embedding")
    val evalSet = Seq((0L, ev)).toDF("vec_id", "embedding")
    val r = Similarity.semanticContamination(corpus, evalSet, threshold = 0.9)
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("eval_id"), x.getAs[Double]("cosine")))
    assert(r.toSeq == Seq((100L, 0L, 1.0)),
      s"expected only the planted copy, got ${r.toSeq}")
  }

  test("trigram search: candidates superset, confirmed exactly the contains set") {
    val d = Seq(
      (1L, "xx batch stream yy"), // true match
      (2L, "stream batch xx"), // has all trigrams of 'batch str'? no 'h s'
      (3L, "batch stxreamch h s"), // engineered false positive candidate
      (4L, "nothing here"),
      // ALL 10 pattern trigrams present ('eam' from 'xeam') but the
      // pattern itself is not — must surface as a candidate with
      // confirmed=false (the r13 row-local gate keeps the superset
      // semantics of the exploded-index shape)
      (5L, "batch streaxeam")
    ).toDF("doc_id", "text")
    val r = TrigramIndex.substringSearch(d, "batch stream").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("confirmed")).toMap
    assert(r(1L), "true match not confirmed")
    assert(!r.contains(4L), "non-candidate leaked")
    assert(r.get(5L).contains(false), "all-trigrams false positive must be a candidate, unconfirmed")
    // Every confirmed==true row really contains the pattern; candidates
    // that do not are reported false.
    r.foreach { case (id, conf) =>
      val text = d.collect().find(_.getLong(0) == id).get.getString(1)
      assert(conf == text.contains("batch stream"))
    }
  }

  test("equi-depth bins: uniform data splits evenly, bins cover ordered ranges") {
    val d = (1 to 1000).map(_.toDouble).toDF("v")
    val r = Binning.equiDepth(d, "v", bins = 10).collect()
      .map(x => x.getAs[Long]("bin") ->
        (x.getAs[Long]("n"), x.getAs[Double]("lo"), x.getAs[Double]("hi")))
      .sortBy(_._1)
    assert(r.map(_._1).toSeq == (0L to 9L))
    // 1..1000 deciles at 100.9, 200.8, ... -> bins of exactly 100, except
    // boundary interpolation puts the .9 values down: bin 0 = 1..100, etc.
    assert(r.map(_._2._1).sum == 1000L)
    assert(r.forall { case (_, (n, lo, hi)) => n >= 99 && n <= 101 && lo <= hi })
    // Ranges are disjoint and ordered
    r.sliding(2).foreach {
      case Array((_, (_, _, hi1)), (_, (_, lo2, _))) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("first-touch attribution: sessions split at the gap, purchase converts") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val d = Seq(
      // user 1: session A (click at 0, purchase at 10) -> click converts;
      // session B after 40-min gap (view at 50) -> view, no conversion
      (1L, 1L, "click", ts(0)), (1L, 2L, "purchase", ts(10)), (1L, 3L, "view", ts(50)),
      // user 2: one session (signup at 0, click at 20) -> signup, none
      (2L, 4L, "signup", ts(0)), (2L, 5L, "click", ts(20))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val r = Sessionize.firstTouchAttribution(d, gapSec = 1800).collect()
      .map(x => x.getAs[String]("first_type") ->
        (x.getAs[Long]("n_sessions"), x.getAs[Long]("n_converted"))).toMap
    assert(r == Map("click" -> ((1L, 1L)), "view" -> ((1L, 0L)), "signup" -> ((1L, 0L))))
  }

  test("repeated spans: maximal islands, span arithmetic, no false spans") {
    // doc1 and doc2 share a 10-word prefix -> with w=8, positions 0..2
    // are repeated shingles in each: ONE island, run 3, span 3+7=10.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> (shared + " x1 y1 z1 w1 v1 u1 t1 q1"),
      2L -> (shared + " x2 y2 z2 w2 v2 u2 t2 q2"),
      3L -> "totally different words here nothing shared at all ok"
    )
    val spans = Dedup.repeatedSpans(d, w = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("repeated_tokens"),
          r.getAs[Long]("max_span_tokens"))).toMap
    assert(spans == Map(1L -> ((1L, 10L, 10L)), 2L -> ((1L, 10L, 10L))))
  }

  test("triangle counting: K4 has 3 per node, direction/duplicate-proof") {
    // K4 on 1..4 (each node in C(3,2)=3 triangles), plus a dangling edge
    // 5-6; edges given in mixed orientation with duplicates.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L), (3L, 4L), (2L, 4L),
      (5L, 6L)
    ).toDF("src", "dst")
    val counts = Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_triangles")).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("temperature mixture: small domains up-weighted, rates bounded") {
    val d = ((1 to 90).map(i => (i.toLong, "big")) ++ (91 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val r = Sampling.temperatureSample(d, "lang", "doc_id")
      .collect().map(x => x.getAs[String]("lang") -> x.getAs[Long]("rate_pm")).toMap
    // sqrt weighting: rate(small)/rate(big) ~ sqrt(90/10) = 3
    assert(r("small") > r("big"))
    assert(r.values.forall(v => v >= 0 && v <= 1000))
    // exact expected rates: w=(sqrt90, sqrt10); rate_s = floor(500*100*sqrt(n)/ (sumw*n))
    val sumw = math.sqrt(90) + math.sqrt(10)
    def exp(n: Int) = math.min(1000, math.floor(500.0 * 100 * math.sqrt(n) / (sumw * n)).toLong)
    assert(r("big") == exp(90) && r("small") == exp(10))
  }

  test("contrastive pairs: planted duplicate is the positive, margins nonneg") {
    val rng = new scala.util.Random(11)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v), (1L, v)) ++
      (2L to 40L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.contrastivePairs(emb, emb.filter($"vec_id" === 0))
      .collect()
    assert(pairs.length == 3)
    assert(pairs.forall(_.getAs[Long]("pos_id") == 1L))
    assert(pairs.forall(r => r.getAs[Double]("margin") >= 0.0))
  }

  test("Bloom membership: no false negatives, members always maybe") {
    val build = (1L to 50L).map(i => Tuple1(i)).toDF("key")
    val probes = (1L to 200L).map(i => Tuple1(i)).toDF("key")
    val row = Bloom.membershipSummary(build, probes, "key").head()
    assert(row.getAs[Long]("n_probes") == 200L)
    assert(row.getAs[Long]("n_members") == 50L)
    // every member must report maybe (no false negatives)
    assert(row.getAs[Long]("n_maybe") >= 50L)
    assert(row.getAs[Long]("n_maybe") - row.getAs[Long]("n_false_pos") == 50L)
    // 50 keys x 3 bits in 4096: FP rate ~ (1-e^(-150/4096))^3 ~ 5e-5;
    // 150 non-member probes should essentially never all-collide.
    assert(row.getAs[Long]("n_false_pos") <= 2L)
  }

  test("windowed co-occurrence PMI: pair domain and counts") {
    val d = docs(1L -> "a b c a")
    // window 2, unordered: (a,b),(b,c),(c,a) at offset 1; (a,c),(a,b) at
    // offset 2 -> (a,b):2, (a,c):2, (b,c):1.
    val rows = Cooccur.pmiPairs(d, window = 2, topK = 10).collect()
    val counts = rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("c_ab")).toMap
    assert(counts == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
    // PMI of (b,c): ln((1/5) / ((1/4)*(1/4))) = ln(16/5)
    val bc = rows.find(r => r.getString(0) == "b" && r.getString(1) == "c").get
    assert(math.abs(bc.getAs[Double]("pmi") - math.log(16.0 / 5.0)) < 1e-5)
  }

  test("BPE merge training: greedy overlap, frequency weighting, tie-break") {
    // "aaaa"×3 + "ab"×2: step 1 pair (a,a) freq 3·3=9 beats (a,b) freq 2.
    // Greedy overlap: "aaaa" = [a,a,a,a] merges at positions 1 and 3 only
    // → [aa,aa], so step 2's top pair is (aa,aa) freq 3.
    val d = docs(1L -> "aaaa aaaa aaaa ab ab")
    val m = Bpe.trainMerges(d, steps = 2).orderBy("step").collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a" &&
      m(0).getLong(3) == 9L)
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "aa" &&
      m(1).getLong(3) == 3L)

    // Exact-tie argmax: "ba"×2 + "bc"×2 ties (b,a) vs (b,c) at 2 —
    // lexicographic right token breaks it toward (b,a).
    val t = docs(1L -> "ba ba bc bc")
    val mt = Bpe.trainMerges(t, steps = 1).collect()
    assert(mt(0).getString(1) == "b" && mt(0).getString(2) == "a")
  }

  test("exact dedup groups identical texts under min keeper id") {
    val d = docs(1L -> "hello world", 2L -> "hello world", 3L -> "something else")
    val groups = Dedup.exactGroups(d).collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("dup_cnt") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds a one-word-edit near-duplicate") {
    // 100-word doc, one word edited → trigram jaccard ≈ 0.94 (>= 0.8
    // default); at that similarity the 16×4 banding finds the pair with
    // near-certainty (deterministic given the fixed hash family).
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val edited = base.replace(" w50 ", " zzz ")
    val other = (0 until 100).map(i => s"x$i").mkString(" ")
    val d = docs(1L -> base, 2L -> edited, 3L -> other)
    val pairs = Dedup.minhashPairs(d).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    assert(!pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 3L)))
    val j = pairs.find(r => (r.getLong(0), r.getLong(1)) == (1L, 2L)).get.getAs[Double]("jaccard")
    assert(j > 0.9 && j < 1.0)
  }

  test("simhash of a near-duplicate has small hamming distance") {
    // SimHash needs enough tokens for the per-bit tallies to be stable;
    // a one-token edit in a ~170-token doc flips only a few signature bits.
    val base = Seq.fill(10)(
      "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    ).mkString(" ")
    val edited = base.replaceFirst("lazy", "calm")
    val d = docs(1L -> base, 2L -> edited)
    val pairs = Dedup.simhashPairs(d, maxHamming = 16).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Int]("hamming") <= 16)
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    val same = "alpha beta gamma delta epsilon zeta"
    val d = docs(1L -> same, 2L -> same, 3L -> "one two three four five six")
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) == (1L, 2L))
    assert(pairs(0).getAs[Double]("jaccard") == 1.0)
  }

  test("ngram jaccard: exactly-at-threshold subset pairs survive float prefix shaving") {
    // doc_a's k shingles ⊂ doc_b's m → j = k/m = t exactly, with (1-t)·m
    // landing just below an integer in floats: an un-epsiloned floor
    // shaves doc_b's prefix one short, and when the non-shared (rarest)
    // shingles ARE that prefix the pair vanishes. Found live at sf0.1
    // with t=0.8; swept here across exact-rational thresholds.
    for ((k, m, t) <- Seq((8, 10, 0.8), (8, 12, 2.0 / 3), (9, 12, 0.75), (9, 10, 0.9))) {
      val a = (0 until k + 2).map(i => s"w$i").mkString(" ") // k trigram shingles
      val b = (0 until m + 2).map(i => s"w$i").mkString(" ") // m, superset
      val d = docs(1L -> a, 2L -> b)
      val pairs = Dedup.ngramJaccardPairs(d, threshold = t).collect()
      assert(pairs.length == 1, s"lost the j=$k/$m pair at t=$t")
      assert(math.abs(pairs(0).getAs[Double]("jaccard") - k.toDouble / m) < 1e-6)
    }
  }

  test("ngram jaccard: prefix+positional filter matches the brute-force quadratic (seeded sweep)") {
    // Random small-vocab corpus (forces heavy shingle sharing) + planted
    // one-word-edit near-dups: the PPJoin pipeline must return EXACTLY the
    // quadratic all-pairs result — completeness of prefix selection, the
    // size-ratio prune, and the positional bound all pinned at once.
    val rng = new scala.util.Random(7)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val baseDocs = (0 until 40).map { i =>
      i.toLong -> Seq.fill(6 + rng.nextInt(20))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    val editedDups = (0 until 10).map { i =>
      val (src, text) = baseDocs(rng.nextInt(baseDocs.length))
      val words = text.split(" ")
      words(rng.nextInt(words.length)) = "zz"
      (100L + i, words.mkString(" "))
    }
    val d = docs(baseDocs ++ editedDups: _*)
    for (t <- Seq(0.5, 0.8)) {
      val fast = Dedup.ngramJaccardPairs(d, threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sh = Dedup.hashedTokenShingles(d, 3).filter(size($"shingles") > 0)
      val a = sh.select($"doc_id".as("doc_a"), $"shingles".as("sh_a"))
      val b = sh.select($"doc_id".as("doc_b"), $"shingles".as("sh_b"))
      val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          round(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            size(array_union($"sh_a", $"sh_b")), 6).as("jaccard"))
        .filter($"jaccard" >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute, s"threshold $t: fast ${fast.size} vs brute ${brute.size}")
      assert(brute.nonEmpty, s"threshold $t produced an empty oracle — fixture too weak")
    }
  }

  test("connected components ≡ union-find on random pair graphs and a worst-case chain") {
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rng = new scala.util.Random(29)
    val randomPairs = (0 until 60).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val chain = (0L until 30L).map(i => (i, i + 1)) // diameter 30: many propagation rounds
    for (pairs <- Seq(randomPairs, chain)) {
      val df = pairs.toDF("doc_a", "doc_b")
      val got = Dedup.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs), s"pairs=${pairs.take(5)}...")
    }
  }

  test("large-star/small-star components ≡ union-find, including a 512-node chain (O(log n) rounds)") {
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rng = new scala.util.Random(31)
    val randomPairs = (0 until 80).map(_ => (rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val clique = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i + 100L, j + 100L)
    // a 512-node chain has diameter 511: min-label propagation would need
    // ~511 rounds; star contraction finishes this in a handful — running
    // it at all inside a unit test is the O(log n) demonstration
    val chain = (0L until 511L).map(i => (i, i + 1))
    for (pairs <- Seq(randomPairs, clique.toSeq, chain)) {
      val df = pairs.toDF("doc_a", "doc_b")
      val got = Dedup.connectedComponentsStar(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs), s"pairs=${pairs.take(5)}...")
    }
    // parity with the propagation variant on the random graph
    val df = randomPairs.toDF("doc_a", "doc_b")
    val a = Dedup.connectedComponents(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsStar(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("hash split: stable under repartitioning and corpus growth; fractions sane; salts independent") {
    val base = (0L until 2000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    def assignments(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "doc_id").select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignments(base)
    assert(assignments(base.repartition(13)) == a, "repartitioning changed assignments")
    val grown = (0L until 3000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val g = assignments(grown)
    assert(a.forall { case (k, v) => g(k) == v }, "corpus growth changed existing assignments")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.03 && math.abs(frac("val") - 0.05) < 0.02)
    // different salt → a genuinely different draw
    val other = Sampling.hashSplit(base, "doc_id", salt = "v2").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other != a)
    // deterministic sample is a subset-stable filter
    val s1 = Sampling.deterministicSample(base, "doc_id", 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(grown, "doc_id", 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s2) && math.abs(s1.size / 2000.0 - 0.1) < 0.03)
  }

  test("stratified sample: per-stratum rates honored, default applied, membership stable") {
    val docs = (0L until 3000L)
      .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 200, "de" -> 800)
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratifiedSample(df, "lang", "doc_id", rates, defaultPerMille = 500)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val k = kept(docs)
    // ~1000 docs per stratum; rates should land near 20% / 80% / 50%
    def frac(lang: String, m: Long => Boolean): Double =
      k.count(m).toDouble / 1000.0
    assert(math.abs(frac("en", _ % 3 == 0) - 0.2) < 0.05)
    assert(math.abs(frac("de", _ % 3 == 1) - 0.8) < 0.05)
    assert(math.abs(frac("fr", _ % 3 == 2) - 0.5) < 0.05)
    assert(kept(docs.repartition(17)) == k, "repartitioning changed membership")
    // a kept en-doc stays kept when its stratum's rate only increases
    val up = Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 600),
        defaultPerMille = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k.filter(_ % 3 == 0).subsetOf(up))
  }

  test("quality checks: null rows violate, all row rules share one scan") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 60L))
      .toDF("id", "qty")
    val out = Checks.run(
      df,
      rowRules = Seq("qty_1_50" -> $"qty".between(1, 50), "id_nn" -> $"id".isNotNull),
      uniqueRules = Seq("id_unique" -> Seq("id"))
    ).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // null qty is a violation (expectation not provably satisfied), 60 too
    assert(out == Map("qty_1_50" -> 2L, "id_nn" -> 0L, "id_unique" -> 0L))

    val dup = df.union(df)
    val dupOut = Checks.uniqueCheck(dup, "id_unique", Seq("id")).collect()
    assert(dupOut(0).getLong(1) == 3L) // one extra row per key

    // one pass: the row-rules plan reads its source exactly once
    val plan = Checks.rowChecks(df, Seq("a" -> $"qty".isNotNull, "b" -> ($"qty" > 0)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), "row rules must not fan out into per-rule scans")

    // an empty table has zero violations, not null
    val empty = Checks.run(df.filter($"id" < 0),
      rowRules = Seq("r" -> $"qty".isNotNull), uniqueRules = Seq("u" -> Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty == Map("r" -> 0L, "u" -> 0L))
  }

  test("repetition metrics: repeated phrase scores high, unique text zero") {
    val repeated = Seq.fill(5)("spam and eggs").mkString(" ") // 15 words, 3 distinct
    val unique = "one two three four five six"
    val d = docs(1L -> repeated, 2L -> unique)
    val out = TextAnalysis.repetitionMetrics(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((15, 0.8, 0.769231))) // 1 - 3 distinct of 13 trigrams
    assert(out(2L) == ((6, 0.0, 0.0)))
  }

  test("decontamination flags the benchmark's near-copy, not unrelated docs") {
    val bench = docs(100L -> (0 until 40).map(i => s"b$i").mkString(" "))
    val nearCopy = (0 until 40).map(i => if (i == 20) "zzz" else s"b$i").mkString(" ")
    val clean = (0 until 40).map(i => s"c$i").mkString(" ")
    val corpus = docs(1L -> nearCopy, 2L -> clean)
    val out = Dedup.contaminatedDocs(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) >= 30L) // one-word edit keeps ~35 of 38 trigrams
  }

  test("packing: two-phase prefix sum ≡ naive global cumsum across bucket sizes; overflow bounded") {
    val rng = new scala.util.Random(31)
    val rows = (0L until 500L).map(i => (i, Seq.fill(3 + rng.nextInt(60))("w").mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val budget = 200L
    // naive reference: exclusive cumsum in doc order
    val toks = rows.map { case (id, t) => (id, t.split(" ").length.toLong) }
    val naive = toks.scanLeft(((-1L, 0L), 0L)) { case ((_, cum), (id, n)) => ((id, n), cum + n) }
      .drop(1).map { case ((id, n), cumIncl) => id -> ((cumIncl - n) / budget) }.toMap
    for (bucket <- Seq(7L, 64L, 1000L)) {
      val got = Packing.chunkAssignments(df, budget, bucket).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == naive, s"bucketSize $bucket diverges from the global cumsum")
    }
    // chunk totals exceed the budget by less than their last doc
    val manifest = Packing.packByTokenBudget(df, budget).collect()
    assert(manifest.forall(_.getAs[Long]("n_tokens") < budget + 63))
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == toks.map(_._2).sum)
  }

  test("brute-force ANN ranks an exact duplicate vector first with cosine 1") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val w = Array.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val emb = Seq((0L, v, 0), (1L, v, 0), (2L, w, 1)).toDF("vec_id", "embedding", "label")
    val top = Similarity
      .bruteTopK(emb, emb.filter($"vec_id" === 0), k = 2)
      .orderBy($"rank")
      .collect()
    assert(top(0).getAs[Long]("neighbor_id") == 1L)
    assert(math.abs(top(0).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("bruteTop1 ≡ bruteTopK k=1 on real embeddings (tie-break included)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val viaWindow = Similarity.bruteTopK(emb, emb, k = 1)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val viaAgg = Similarity.bruteTop1(emb, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("ivfTop1 ≡ ivfTopK k=1 (same candidates, tie-break) + brute differential") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val viaWindow = Similarity.ivfTopK(emb, emb, k = 1)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val viaAgg = Similarity.ivfTop1(emb, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // exact: the max-struct reduction over IVF candidates must equal the
    // window formulation over the same candidate sets
    assert(viaAgg.toSeq === viaWindow.toSeq)
    // differential vs the exact O(n²) baseline (q390's pre-r8 plan, kept
    // here as the reference): with 16 cells / nprobe=4 the index scans
    // ~25% of the corpus; on this deterministic data the top-1 agreement
    // is 316/500. Assert a floor well above chance (nprobe/cells = 25%)
    // so index-quality regressions (bad seeding, broken Lloyd) surface.
    val brute = Similarity.bruteTop1(emb, emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = viaAgg.count { case (q, n, _) => brute.get(q).contains(n) }
    assert(agree >= 300,
      s"IVF top-1 recall vs brute collapsed: $agree/${viaAgg.length}")
  }

  test("LSH ANN also finds the exact duplicate (same bucket in every table)") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val w = Array.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val emb = Seq((0L, v, 0), (1L, v, 0), (2L, w, 1)).toDF("vec_id", "embedding", "label")
    val top = Similarity.lshTopK(emb, emb.filter($"vec_id" === 0), k = 2).collect()
    assert(top.exists(r => r.getAs[Long]("neighbor_id") == 1L &&
      math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    // md5-plane variant: same contract (dup collides in every table).
    val topMd5 = Similarity.lshTopKMd5(emb, emb.filter($"vec_id" === 0), k = 2).collect()
    assert(topMd5.exists(r => r.getAs[Long]("neighbor_id") == 1L &&
      math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
  }

  test("IVF ANN: exact dup found (same cell), scores match brute, recall reasonable") {
    val rng = new scala.util.Random(3)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v, 0), (1L, v, 0)) ++
      (2L to 200L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 3)
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, numCells = 8, nprobe = 3).collect()
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
    // The duplicate vector lands in the query's own (first-probed) cell.
    assert(ivf.exists(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 1L &&
      math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    // Scoring is exact: every IVF (query, neighbor) cosine equals brute's.
    val bruteScores = brute
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    val bruteAll = Similarity.bruteTopK(emb, queries, k = 200).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(bruteAll(key) == r.getAs[Double]("cosine"), s"score mismatch at $key")
    }
    // Probing 3 of 8 cells: expect a usable fraction of the true top-5.
    val hits = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = brute.count(r =>
      hits((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))).toDouble / brute.length
    assert(recall >= 0.2, s"recall@5 collapsed: $recall")
    // Within each query, ranks are dense and ordered by cosine desc.
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getAs[Double]("cosine")).toSeq.reverse.sorted.reverse ==
        sorted.map(_.getAs[Double]("cosine")).toSeq)
    }
  }

  test("PQ ANN: dup found, emitted scores exact, recall floor; full rerank ≡ brute") {
    val rng = new scala.util.Random(5)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v, 0), (1L, v, 0)) ++
      (2L to 200L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 3)
    val pq = Similarity.pqTopK(emb, queries, k = 5).collect()
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
    // the exact duplicate has the minimal ADC distance too — always retrieved
    assert(pq.exists(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 1L &&
      math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    // emitted cosines come from the exact rerank stage, so every
    // (query, neighbor) score equals the brute-force value
    val bruteAll = Similarity.bruteTopK(emb, queries, k = 200).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    pq.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(bruteAll(key) == r.getAs[Double]("cosine"), s"score mismatch at $key")
    }
    // ADC candidates then exact rerank: expect most of the true top-5
    val hits = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = brute.count(r =>
      hits((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))).toDouble / brute.length
    assert(recall >= 0.4, s"recall@5 collapsed: $recall")
    // rerank >= corpus makes candidate selection lossless: exactly brute
    val full = Similarity.pqTopK(emb, queries, k = 5, rerank = 300).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
      .toSet
    val bruteSet = brute
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(full == bruteSet)
  }

  test("IVF-PQ ANN: dup found, emitted scores exact, recall floor; lossless at full width") {
    val rng = new scala.util.Random(9)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v, 0), (1L, v, 0)) ++
      (2L to 200L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 3)
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 5, numCells = 8, nprobe = 3).collect()
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
    // the exact duplicate shares the query's first-probed cell AND has
    // minimal ADC distance — always retrieved
    assert(ivfpq.exists(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 1L &&
      math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    // emitted cosines come from the exact rerank stage
    val bruteAll = Similarity.bruteTopK(emb, queries, k = 200).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    ivfpq.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(bruteAll(key) == r.getAs[Double]("cosine"), s"score mismatch at $key")
    }
    // cells prune more aggressively than either structure alone — still
    // expect a usable fraction of the true top-5
    val hits = ivfpq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = brute.count(r =>
      hits((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))).toDouble / brute.length
    assert(recall >= 0.2, s"recall@5 collapsed: $recall")
    // probing ALL cells with rerank >= corpus degrades exactly to brute
    val full = Similarity
      .ivfPqTopK(emb, queries, k = 5, numCells = 4, nprobe = 4, rerank = 300)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
      .toSet
    val bruteSet = brute
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(full == bruteSet)
  }

  test("embedding near-dup catches duplicate vectors through SRP buckets") {
    val rng = new scala.util.Random(1)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v, 0), (1L, v, 0)) ++
      (2L to 30L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDupPairs(emb, threshold = 0.99).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
  }

  test("md5-derived SRP planes are exact 48-bit rationals in [-1, 1) and find dups") {
    val planes = graft.functions.SrpSignatures.makePlanesMd5(8, 2, 3)
    assert(planes.length == 2 * 3 * 8)
    assert(planes.forall(w => w >= -1.0 && w < 1.0))
    // Each component is k/2^47 for integer k — exactly representable, so a
    // SQL engine dividing the same 48-bit integer by 2^47 gets the same bits.
    assert(planes.forall(w => (w * 140737488355328.0) == math.rint(w * 140737488355328.0)))
    // Deterministic: no RNG state, same strings -> same family.
    assert(planes.sameElements(graft.functions.SrpSignatures.makePlanesMd5(8, 2, 3)))

    val rng = new scala.util.Random(7)
    val v = Array.fill(64)(rng.nextGaussian().toFloat)
    val rows = Seq((0L, v, 0), (1L, v, 0)) ++
      (2L to 30L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDupPairsMd5(emb, threshold = 0.99).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
  }

  test("multimodal frame-sample, resize, and feature shapes") {
    // 10-byte payload -> n_frames = 1 + 10%7 = 4; stride 2 samples j=0,2.
    val text = "abcdefghij"
    val media = Multimodal.mediaFromDocuments(docs(1L -> text))
    val frames = Multimodal.sampleFrames(media, stride = 2)
      .orderBy($"frame_id").collect()
    assert(frames.map(_.getAs[Int]("frame_id")).toSeq == Seq(0, 2))
    // frame 0 = bytes [0, 2) = "ab"; frame 2 = [5, 7) = "fg".
    assert(frames(0).getAs[Long]("frame_bytes") == 2L)
    assert(frames(0).getAs[Double]("frame_mean_byte") == ('a' + 'b').toDouble / 2)
    assert(frames(1).getAs[Double]("frame_mean_byte") == ('f' + 'g').toDouble / 2)

    val resized = Multimodal.resize(media, outW = 2, outH = 3).collect()(0)
    assert(resized.getAs[Int]("out_w") == 2 && resized.getAs[Int]("out_h") == 3)
    val payload = resized.getAs[Array[Byte]]("payload")
    assert(payload.length == 6)
    // Nearest-neighbor positions i*10/6 = 0,1,3,5,6,8.
    assert(new String(payload, "UTF-8") == "abdfgi")

    // Features are ANN-compatible: histogram of a duplicate payload ranks
    // first with cosine 1 through the UNCHANGED similarity operator.
    val m2 = Multimodal.mediaFromDocuments(
      docs(1L -> text, 2L -> text, 3L -> "zzzzzzzzzz zz zzz")
    )
    val emb = Multimodal.byteHistogramFeatures(m2)
      .select($"doc_id".as("vec_id"), $"features".as("embedding"))
    val top = Similarity.bruteTopK(emb, emb.filter($"vec_id" === 1), k = 1).collect()
    assert(top(0).getAs[Long]("neighbor_id") == 2L)
    assert(math.abs(top(0).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("quality metrics arithmetic on a known sentence") {
    val d = docs(1L -> "The cat sat on the mat.")
    val m = TextAnalysis.qualityMetrics(d).collect()(0)
    assert(m.getAs[Long]("n_chars") == 23L)
    assert(m.getAs[Long]("n_words") == 6L)
    assert(m.getAs[Long]("n_stopwords") == 2L) // "on", "the" (lowercase only)
    assert(math.abs(m.getAs[Double]("avg_word_len") - 3.0) < 1e-9) // (23-5)/6
    assert(math.abs(m.getAs[Double]("punct_ratio") - 1.0 / 23) < 1e-6)
    assert(math.abs(m.getAs[Double]("upper_ratio") - 1.0 / 23) < 1e-6)
  }

  test("gopher rules: each rule trips on its crafted offender, clean doc passes") {
    val goodBody = (Seq.fill(20)("the quick brown fox jumps on a log") :+ "end").mkString(" ")
    val d = docs(
      1L -> goodBody, // 161 words, healthy everything
      2L -> "too short to pass the word count", // < 50 words
      3L -> (Seq.fill(60)("## ### # word the of").mkString(" ")), // symbol-heavy
      4L -> (Seq.fill(30)("- bullet line the of\n").mkString + "tail"), // bullet lines
      5L -> (Seq.fill(30)("trailing line the of...\n").mkString + "tail"), // ellipsis lines
      6L -> (Seq.fill(60)("123 456 the of").mkString(" ")), // numeric words
      7L -> (Seq.fill(60)("lorem ipsum dolor sit").mkString(" ")) // no stopwords
    )
    val m = TextAnalysis.gopherRules(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Boolean]("passes_gopher"))
    assert(!m(2L).getAs[Boolean]("words_ok") && !m(2L).getAs[Boolean]("passes_gopher"))
    assert(!m(3L).getAs[Boolean]("symbol_ok"))
    assert(!m(4L).getAs[Boolean]("bullet_ok"))
    assert(!m(5L).getAs[Boolean]("ellipsis_ok"))
    assert(!m(6L).getAs[Boolean]("alpha_ok"))
    assert(!m(7L).getAs[Boolean]("stopword_ok"))
    // exact integer thresholds: doc 1 mean word length = chars/words
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_words") == 161L)
    assert(r1.getAs[Boolean]("word_len_ok"))
    // boundary exactness: symbol ratio exactly 0.1 still passes (<=)
    val edge = docs(10L -> (Seq.fill(9)("the of a to in on is and for").mkString(" ") + " # word the of a to in on is and for word word word word word word word word"))
    val er = TextAnalysis.gopherRules(edge).collect()(0)
    val nw = er.getAs[Long]("n_words")
    assert(nw == 100L, s"edge doc has $nw words")
    assert(er.getAs[Boolean]("symbol_ok"), "1 symbol in 100 words is <= 0.1 exactly? no — 10*1 <= 100")
  }

  test("url parse: host/domain/path-depth/params across URL shapes") {
    val d = Seq(
      (1L, "https://www.news.example.co/politics/2024/story?ref=7&src=rss"),
      (2L, "https://example.co/"),
      (3L, "https://cdn.assets.example.co/img/a/b/c/d.png"),
      (4L, "http://bare.org")
    ).toDF("doc_id", "url")
    val p = UrlOps.parseUrls(d, "url", Seq("ref")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(1L).getAs[String]("host") == "www.news.example.co")
    assert(p(1L).getAs[String]("registered_domain") == "example.co")
    assert(p(1L).getAs[String]("path") == "/politics/2024/story")
    assert(p(1L).getAs[Long]("path_depth") == 3L)
    assert(p(1L).getAs[String]("query_ref") == "7")
    assert(p(2L).getAs[Long]("path_depth") == 0L) // "/" = one slash, trailing
    assert(p(2L).getAs[String]("query_ref") == null)
    assert(p(3L).getAs[Long]("path_depth") == 5L) // img,a,b,c,d.png
    assert(p(4L).getAs[String]("host") == "bare.org")
    assert(p(4L).getAs[String]("registered_domain") == "bare.org")
    assert(p(4L).getAs[Long]("path_depth") == 0L) // empty path

    val prof = UrlOps.domainProfile(UrlOps.parseUrls(d, "url")).collect()
      .map(r => r.getAs[String]("registered_domain") -> r).toMap
    assert(prof("example.co").getAs[Long]("n_docs") == 3L)
    assert(prof("example.co").getAs[Long]("n_hosts") == 3L)
    assert(prof("bare.org").getAs[Long]("n_docs") == 1L)
  }

  test("js divergence: 0 for identical mixes, ln 2 for disjoint vocab") {
    // groups a and b: identical word distributions -> JS(a vs rest=b) = 0
    val same = Seq("a" -> "x", "a" -> "y", "b" -> "x", "b" -> "y")
      .toDF("src", "w")
    val r0 = Drift.jsVsRest(same, "src", "w").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Double]("js_vs_rest")).toMap
    assert(r0("a") == 0.0 && r0("b") == 0.0)

    // disjoint vocabularies -> maximal JS = ln 2 (round 6)
    val disj = Seq("a" -> "x", "a" -> "x", "b" -> "y", "b" -> "z")
      .toDF("src", "w")
    val r1 = Drift.jsVsRest(disj, "src", "w").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Double]("js_vs_rest")).toMap
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(math.abs(r1("a") - ln2) < 2e-6, s"got ${r1("a")}")
    assert(math.abs(r1("b") - ln2) < 2e-6)

    // result is invariant under repartition (the dyadic-snap guarantee)
    val rep = Drift.jsVsRest(disj.repartition(7), "src", "w").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Double]("js_vs_rest")).toMap
    assert(rep == r1)
  }

  test("cdc chunks: boundaries resynchronize after an insertion (fixed windows don't)") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val body = (1 to 400).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val d = docs(1L -> body, 2L -> s"inserted $body")
    val r = Dedup.cdcChunks(d, w = 4, divisor = 16).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val n1 = r(1L).getAs[Long]("n_chunks")
    val s1 = r(1L).getAs[Long]("n_shared_chunks")
    // after the first content-defined boundary the streams realign, so all
    // but the head chunk (and hash accidents near it) dedup across docs
    assert(n1 > 10, s"expected many chunks, got $n1")
    assert(s1 >= n1 - 2, s"CDC must resynchronize: $s1 of $n1 shared")
    // the fixed-width scheme on the same pair shares (essentially) nothing
    val fixedShared = Dedup.chunkDedup(d, chunkWords = 16)
      .agg(sum(col("n_chunks") - col("n_kept"))).collect()(0).getLong(0)
    assert(fixedShared <= 1, s"fixed windows shifted by 1 token shared $fixedShared")
    // determinism under repartition
    val again = Dedup.cdcChunks(d.repartition(5), w = 4, divisor = 16).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_shared_chunks")).toMap
    assert(again(1L) == s1)
  }

  test("token counts: BPE-ish regex separates punctuation") {
    val d = docs(1L -> "hello, world! it's fine")
    val m = TextAnalysis.tokenCounts(d).collect()(0)
    assert(m.getAs[Long]("n_ws_tokens") == 4L)
    // hello , world ! it ' s fine → 8
    assert(m.getAs[Long]("n_tokens") == 8L)
  }

  test("langid picks the profile with the most marker hits, ties to earlier profile") {
    val d = Seq(
      (1L, "the cat and the dog is in the house", "en"),
      (2L, "el perro y la casa de la madre que canta", "es"),
      (3L, "xyzzy plugh foobar", "zz") // no hits anywhere → tie → first profile (en)
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "en")
  }

  test("rolling_hash64 codegen matches the reference fold; order-sensitive") {
    RollingHash64.register(spark)
    val d = docs(1L -> "abc", 2L -> "acb")
    val out = d
      .select($"doc_id", expr("rolling_hash64(text)").as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * RollingHash64.DefaultBase + (b & 0xff))
    assert(out(1L) == ref("abc"))
    assert(out(2L) == ref("acb"))
    assert(out(1L) != out(2L)) // rolling hash is position-sensitive, unlike a bag hash
  }

  test("multimodal stub decode: metadata arithmetic and batch path") {
    val d = docs(7L -> "abcd")
    val m = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(d)).collect()(0)
    assert(m.getAs[Long]("n_bytes") == 4L)
    assert(m.getAs[Int]("width") == 64 + 4 % 577)
    assert(m.getAs[Int]("height") == (64 + (4 * 31 + 'a'.toInt) % 353))
    assert(m.getAs[Int]("n_frames") == 1 + 4 % 7)
    assert(math.abs(m.getAs[Double]("mean_byte") - ('a' + 'b' + 'c' + 'd').toDouble / 4) < 1e-9)
  }

  test("as-of join: <= semantics, tie-break, and null when nothing precedes") {
    val left = Seq((10L, "2024-01-05 00:00:00"), (20L, "2024-01-01 00:00:00"))
      .toDF("k", "t")
      .select($"k", $"t".cast("timestamp").as("t"))
      .withColumn("lid", $"k")
    val right = Seq(
      (10L, "2024-01-05 00:00:00", 1L), // simultaneous: visible (<=)
      (10L, "2024-01-05 00:00:00", 2L), // tie-break: higher rid wins
      (10L, "2024-01-06 00:00:00", 3L), // future: invisible
      (20L, "2024-01-02 00:00:00", 4L)  // after left: invisible
    ).toDF("k", "t", "rid").select($"k", $"t".cast("timestamp").as("t"), $"rid")
    val out = AsOfJoin
      .asOf(left, right, "k", "k", "t", "t", Seq("rid" -> "last_rid"), rightTieBreak = Seq("rid"))
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[java.lang.Long]("last_rid")))
      .toMap
    assert(out(10L).contains(2L))
    assert(out(20L).isEmpty)
  }

  test("vector ops: cosine of identical vector is 1, orthogonal is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f))).toDF("a", "b")
    val r = df
      .select(
        VectorOps.cosine(VectorOps.toDouble($"a"), VectorOps.toDouble($"a")).as("same"),
        VectorOps.cosine(VectorOps.toDouble($"a"), VectorOps.toDouble($"b")).as("orth")
      )
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }
}
