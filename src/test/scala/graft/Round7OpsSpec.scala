package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Closed-form goldens for the round-7 measurement operators. */
class Round7OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- Kaplan–Meier ---------------------------------------------------

  test("kaplan-meier: censored users stay at risk but never count as churn") {
    // corpus clock ends 2024-01-10 00:00; censor window = final 24 h
    // u1: lifetime 2 h, ended long ago -> churn at t=2
    // u2: lifetime 2 h, ended long ago -> churn at t=2
    // u3: lifetime 5 h, last event inside the final day -> censored at t=5
    val events = Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L),
      (2L, ts("2024-01-02 02:00:00"), 1L),
      (3L, ts("2024-01-03 00:00:00"), 2L),
      (4L, ts("2024-01-03 02:00:00"), 2L),
      (5L, ts("2024-01-09 13:00:00"), 3L),
      (6L, ts("2024-01-09 18:00:00"), 3L),
      (7L, ts("2024-01-10 00:00:00"), 4L) // clock anchor, lifetime 0, censored? no: single event, lifetime 0, inside final day -> censored
    ).toDF("event_id", "ts", "user_id")
    val out = Survival.kaplanMeier(events).orderBy("t_hours").collect()
    // at-risk at t=2: u1,u2,u3 (u4 lifetime 0 censored, left risk set at 0)
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("t_hours") === 2L)
    assert(r.getAs[Long]("n_risk") === 3L)
    assert(r.getAs[Long]("n_events") === 2L)
    // S(2) = 1 - 2/3
    assert(math.abs(r.getAs[Double]("survival") - 0.333333) < 1e-6)
  }

  test("kaplan-meier: at-risk set draining to zero pins survival at exactly 0") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 01:00:00"), 1L),
      (3L, ts("2024-01-01 00:00:00"), 2L),
      (4L, ts("2024-01-01 03:00:00"), 2L),
      (5L, ts("2024-01-10 00:00:00"), 9L) // clock anchor far ahead; censored at 0
    ).toDF("event_id", "ts", "user_id")
    val out = Survival.kaplanMeier(events).orderBy("t_hours").collect()
    // t=1: risk {u1,u2}, d=1 -> S=0.5 ; t=3: risk {u2}, d=1=n -> S=0
    assert(out.map(_.getAs[Long]("t_hours")).toSeq === Seq(1L, 3L))
    assert(math.abs(out(0).getAs[Double]("survival") - 0.5) < 1e-6)
    assert(out(1).getAs[Double]("survival") === 0.0)
  }

  // ---- ACF ------------------------------------------------------------

  test("acf: period-2 series gives the closed-form lag signs") {
    // hourly counts 1,2,1,2 -> r1 = -0.75, r2 = 0.5 (hand-computed exact)
    val rows = Seq.tabulate(4) { h =>
      (1 to (if (h % 2 == 0) 1 else 2)).map(i => (h.toLong * 10 + i, ts(f"2024-01-01 0$h%d:00:00")))
    }.flatten
    val events = rows.toDF("event_id", "ts")
    val out = Timeseries.acfHourly(events, maxLag = 2).orderBy("lag_h").collect()
    assert(out.map(_.getAs[Long]("lag_h")).toSeq === Seq(1L, 2L))
    assert(math.abs(out(0).getAs[Double]("acf") - (-0.75)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("acf") - 0.5) < 1e-9)
    assert(out(0).getAs[Long]("n_pairs") === 3L)
  }

  test("acf: silent hours are zeros on the grid, not missing points") {
    // events only in hours 0 and 2: series 1,0,1 -> lag-2 pair is (1,1)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 02:00:00"))
    ).toDF("event_id", "ts")
    val out = Timeseries.acfHourly(events, maxLag = 2).orderBy("lag_h").collect()
    // n=3, pairs at lag 1 = 2 (grid includes the empty hour)
    assert(out(0).getAs[Long]("n_pairs") === 2L)
    assert(out(1).getAs[Long]("n_pairs") === 1L)
  }

  // ---- CUSUM change-point --------------------------------------------

  test("cusum change-point: level shift found at the exact boundary") {
    // counts 1,1,1,5,5,5 -> split after idx 2, means 1.0 / 5.0
    val rows = for {
      h <- 0 until 6
      i <- 1 to (if (h < 3) 1 else 5)
    } yield (h.toLong * 100 + i, ts(f"2024-01-01 0$h%d:00:00"))
    val out = Timeseries.cusumChangepoint(rows.toDF("event_id", "ts")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("split_idx") === 2L)
    assert(r.getAs[Long]("stat") === 36L)
    assert(r.getAs[Double]("left_mean") === 1.0)
    assert(r.getAs[Double]("right_mean") === 5.0)
    assert(r.getAs[Timestamp]("split_hour_ts") === ts("2024-01-01 02:00:00"))
  }

  // ---- Quantile normalization ----------------------------------------

  test("quantile normalization maps every group onto the pooled distribution") {
    // g1=[1,2,3], g2=[10,20,30]; pooled=[1,2,3,10,20,30]
    // both groups map to [1, 6.5, 30] -> identical after-stats
    val df = Seq(
      ("g1", 1L, 1.0), ("g1", 2L, 2.0), ("g1", 3L, 3.0),
      ("g2", 4L, 10.0), ("g2", 5L, 20.0), ("g2", 6L, 30.0)
    ).toDF("grp_in", "id", "v")
    val out = QuantileNorm
      .normalize(df, "grp_in", "id", "v")
      .orderBy("grp_in")
      .collect()
    assert(out.length === 2)
    for (r <- out) {
      assert(math.abs(r.getAs[Double]("mean_after") - 12.5) < 1e-6)
      assert(r.getAs[Double]("min_after") === 1.0)
      assert(r.getAs[Double]("max_after") === 30.0)
    }
    assert(math.abs(out(0).getAs[Double]("mean_before") - 2.0) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("mean_before") - 20.0) < 1e-6)
  }

  test("quantile normalization: singleton group maps to the pooled minimum") {
    val df = Seq(("a", 1L, 5.0), ("b", 2L, 1.0), ("b", 3L, 9.0))
      .toDF("g", "id", "v")
    val out = QuantileNorm.normalize(df, "g", "id", "v").orderBy("g").collect()
    // group a has n_g=1 -> p=0 -> pooled[0] = 1.0
    assert(out(0).getAs[Double]("mean_after") === 1.0)
  }

  // ---- Phrase search --------------------------------------------------

  test("phrase search: overlapping matches counted, absent phrase empty") {
    val docs = Seq(
      (1L, "a a a b"),    // "a a" occurs twice (overlap)
      (2L, "a b a"),      // no adjacent "a a"
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val out = Retrieval
      .phraseSearch(docs, Seq("a", "a"))
      .orderBy("doc_id")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    val tri = Retrieval.phraseSearch(docs, Seq("a", "b", "a")).collect()
    assert(tri.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 1L)))
  }

  // ---- Assortativity --------------------------------------------------

  test("assortativity: star graph is perfectly disassortative (r = -1)") {
    val edges = Seq(("c", "x"), ("c", "y"), ("c", "z")).toDF("src", "dst")
    val r = Graph.assortativity(edges).collect().head
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
  }

  test("assortativity: degree-regular graph has zero variance -> NULL") {
    // 4-cycle: every degree 2
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("src", "dst")
    val r = Graph.assortativity(edges).collect().head
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  // ---- Per-group OLS trend -------------------------------------------

  test("linreg trend: exact line recovered; constant series gets NULL r2") {
    val rows =
      (for (h <- 0 until 3; i <- 1 to (h + 1)) yield (s"g$h$i", ts(f"2024-01-01 0$h%d:00:00"), "up")) ++
        (for (h <- 0 until 3; i <- 1 to 2) yield (s"c$h$i", ts(f"2024-01-01 0$h%d:00:00"), "flat"))
    val events = rows.map { case (id, t, g) => (id, t, g) }.toDF("event_id", "ts", "grp")
    val out = Timeseries.linregHourlyTrend(events, "grp").orderBy("grp").collect()
    val flat = out(0)
    assert(flat.getAs[String]("grp") === "flat")
    assert(flat.getAs[Double]("slope") === 0.0)
    assert(flat.getAs[Double]("intercept") === 2.0)
    assert(flat.isNullAt(flat.fieldIndex("r2")))
    val up = out(1)
    // counts 1,2,3 over x=0,1,2 -> slope 1, intercept 1, r2 1
    assert(up.getAs[Double]("slope") === 1.0)
    assert(up.getAs[Double]("intercept") === 1.0)
    assert(up.getAs[Double]("r2") === 1.0)
  }

  // ---- Cross-correlation ---------------------------------------------

  test("ccf: identical series correlate exactly 1 at lag 0, antiphase -1") {
    // click counts 1,2,1,2 ; purchase counts mirror (3-x): 2,1,2,1
    val rows =
      (for (h <- 0 until 4; i <- 1 to (if (h % 2 == 0) 1 else 2))
        yield (h.toLong * 10 + i, ts(f"2024-01-01 0$h%d:00:00"), "click")) ++
        (for (h <- 0 until 4; i <- 1 to (if (h % 2 == 0) 2 else 1))
          yield (100 + h.toLong * 10 + i, ts(f"2024-01-01 0$h%d:00:00"), "purchase"))
    val events = rows.toDF("event_id", "ts", "event_type")
    val anti = Timeseries
      .ccfHourly(events, "click", "purchase", maxLag = 1)
      .orderBy("lag_h").collect()
    assert(anti.map(_.getAs[Long]("lag_h")).toSeq === Seq(-1L, 0L, 1L))
    assert(math.abs(anti(1).getAs[Double]("ccf") - (-1.0)) < 1e-9)
    val self = Timeseries
      .ccfHourly(events.filter(col("event_type") === "click"), "click", "click", maxLag = 1)
    // same-type call: x == y series, lag 0 must be exactly 1
    val r0 = self.filter(col("lag_h") === 0).collect().head
    assert(r0.getAs[Double]("ccf") === 1.0)
    // constant series (click+purchase relabeled = 3 every hour): undefined -> NULL
    val const = Timeseries
      .ccfHourly(events.withColumn("event_type", lit("click")), "click", "click", maxLag = 1)
      .filter(col("lag_h") === 0).collect().head
    assert(const.isNullAt(const.fieldIndex("ccf")))
  }

  // ---- Theil–Sen ------------------------------------------------------

  test("theil-sen: exact line has every pairwise slope equal") {
    val rows = for (h <- 0 until 3; i <- 1 to (h + 1))
      yield (h.toLong * 10 + i, ts(f"2024-01-01 0$h%d:00:00"))
    val out = Timeseries.theilSenSlope(rows.toDF("event_id", "ts")).collect().head
    assert(out.getAs[Long]("n_pairs") === 3L)
    assert(out.getAs[Double]("slope_median") === 1.0)
  }

  // ---- Rolling DAU/WAU -----------------------------------------------

  test("rolling active users: trailing-window distinct, stickiness ratio") {
    // u1 active day0+day1, u2 active day0 only; windowDays=2
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-02 10:00:00"), 1L),
      (3L, ts("2024-01-01 23:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = Sessionize
      .rollingActiveUsers(events, windowDays = 2)
      .orderBy("day_date").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("dau") === 2L)
    assert(out(0).getAs[Long]("wau") === 2L)
    assert(out(0).getAs[Double]("stickiness") === 1.0)
    // day1: DAU {u1}; WAU over {day0, day1} = {u1, u2}
    assert(out(1).getAs[Long]("dau") === 1L)
    assert(out(1).getAs[Long]("wau") === 2L)
    assert(out(1).getAs[Double]("stickiness") === 0.5)
  }

  // ---- Gini -----------------------------------------------------------

  test("gini: equal values 0, single owner (n-1)/n, zero total NULL") {
    val df = Seq(
      ("eq", 1L, 5.0), ("eq", 2L, 5.0),
      ("one", 3L, 0.0), ("one", 4L, 0.0), ("one", 5L, 0.0), ("one", 6L, 1.0),
      ("zero", 7L, 0.0)
    ).toDF("g", "id", "v")
    val out = Drift.giniByGroup(df, "g", "id", "v").orderBy("g").collect()
    assert(out(0).getAs[Double]("gini") === 0.0)
    assert(out(1).getAs[Double]("gini") === 0.75)
    assert(out(2).isNullAt(out(2).fieldIndex("gini")))
  }

  // ---- BH-FDR over KS drift ------------------------------------------

  test("bh-fdr: the shifted shard is rejected, identical shards are not") {
    // A sits on a disjoint value range (KS vs rest = 1); B..F share one
    // distribution — their KS vs rest is only the dilution A causes
    // (D = |A|/|rest| = 0.2), which the BH threshold must NOT reject.
    val rows =
      (1 to 40).map(i => ("A", 1000.0 + i)) ++
        (for (g <- Seq("B", "C", "D", "E", "F"); i <- 1 to 40)
          yield (g, (i % 10).toDouble))
    val df = rows.toDF("src", "v")
    val out = Drift.bhFdrKs(df, "src", "v", alpha = 0.05).orderBy("p_rank").collect()
    assert(out.length === 6)
    assert(out(0).getAs[String]("src") === "A")
    assert(out(0).getAs[Boolean]("rejected"))
    assert(out(0).getAs[Double]("ks_vs_rest") === 1.0)
    assert(out(0).getAs[Double]("p_value") < 0.001)
    for (i <- 1 until 6) assert(!out(i).getAs[Boolean]("rejected"))
    // p-values are ordered with the ranks
    assert(out(0).getAs[Double]("p_value") <= out(1).getAs[Double]("p_value"))
  }

  // ---- Schema-evolution lake read ------------------------------------

  test("readEvolved: added column NULL-fills legacy rows; time travel keeps the old shape") {
    import graft.sources.LakeLog
    val path = java.nio.file.Files
      .createTempDirectory("graft_evolve_spec").resolve("t").toString
    val v1 = LakeLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), path)
    LakeLog.append(Seq((3L, "c", 9.5)).toDF("id", "name", "score"), path)
    val evolved = LakeLog.readEvolved(spark, path)
    assert(evolved.columns.toSet === Set("id", "name", "score"))
    val byId = evolved.orderBy("id").collect()
    assert(byId.length === 3)
    assert(byId(0).isNullAt(byId(0).fieldIndex("score"))) // legacy row
    assert(byId(2).getAs[Double]("score") === 9.5)
    // time travel to v1: still the 2-column shape, old files untouched
    val old = LakeLog.read(spark, path, v1)
    assert(old.columns.toSet === Set("id", "name"))
    assert(old.count() === 2)
  }

  // ---- Geometric median ----------------------------------------------

  test("geometric median: an outlier drags the mean but not the median") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.1f)),
      (3L, Array(-0.1f, 0.0f)), (4L, Array(0.0f, -0.1f)),
      (5L, Array(1000.0f, 0.0f)) // corrupted row
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.geometricMedian(emb, iters = 2)
      .orderBy("pos").collect()
    val meanX = out(0).getAs[Double]("mean_coord")
    val gmX = out(0).getAs[Double]("gmedian_coord")
    assert(meanX > 150.0) // mean dragged to ~166.7
    assert(math.abs(gmX) < meanX / 10.0) // median stays near the mass
  }

  test("geometric median: symmetric cloud keeps its center exactly") {
    val emb = Seq(
      (0L, Array(0.0f, 1.0f)), (1L, Array(2.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.geometricMedian(emb, iters = 2)
      .orderBy("pos").collect()
    assert(out.map(_.getAs[Double]("gmedian_coord")).toSeq === Seq(1.0, 1.0))
    assert(out.map(_.getAs[Double]("mean_coord")).toSeq === Seq(1.0, 1.0))
  }

  // ---- CUPED ----------------------------------------------------------

  test("cuped: perfectly predictive covariate collapses both arms to the global mean") {
    // each user repeats the same value pre and post -> Y = X, theta = 1,
    // rho2 = 1, and both adjusted means equal the global post mean
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0L, 0.10), (2L, ts("2024-01-25 00:00:00"), 0L, 0.10),
      (3L, ts("2024-01-01 00:00:00"), 1L, 0.20), (4L, ts("2024-01-25 00:00:00"), 1L, 0.20),
      (5L, ts("2024-01-01 00:00:00"), 2L, 0.30), (6L, ts("2024-01-25 00:00:00"), 2L, 0.30),
      (7L, ts("2024-01-01 00:00:00"), 3L, 0.40), (8L, ts("2024-01-25 00:00:00"), 3L, 0.40)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = graft.operators.Eval.cupedAdjust(events, splitDays = 15)
      .orderBy("arm").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("theta") === 1.0)
    assert(out(0).getAs[Double]("rho2") === 1.0)
    // raw means differ by arm; adjusted means both land on 0.25
    assert(out(0).getAs[Double]("mean_post") === 0.2)
    assert(out(1).getAs[Double]("mean_post") === 0.3)
    assert(out(0).getAs[Double]("mean_post_adj") === 0.25)
    assert(out(1).getAs[Double]("mean_post_adj") === 0.25)
  }

  // ---- Heaps' law -----------------------------------------------------

  test("heaps law: all-new vocabulary per doc fits beta = 1 exactly") {
    val docs = (0 until 10)
      .map(i => (i.toLong, (0 until 4).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.heapsLaw(docs, buckets = 10).collect().head
    assert(r.getAs[Long]("n_checkpoints") === 10L)
    assert(r.getAs[Long]("total_tokens") === 40L)
    assert(r.getAs[Long]("total_vocab") === 40L)
    assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ln_k")) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  // ---- k-anonymity ----------------------------------------------------

  test("k-anonymity: small classes flagged, homogeneous class floors min_l") {
    val docs = (
      (1 to 6).map(i => (i.toLong, "en", s"src$i", 10L)) ++ // class of 6, l=6
        Seq((7L, "fr", "srcA", 10L), (8L, "fr", "srcA", 10L)) // class of 2, l=1
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = graft.operators.Pii
      .kAnonymityAudit(docs, Seq(expr("n_chars div 50")), col("source"), "lang", k = 5, l = 2)
      .orderBy("lang").collect()
    val en = out(0)
    assert(en.getAs[Long]("n_rows") === 6L)
    assert(en.getAs[Long]("n_small_classes") === 0L)
    assert(en.getAs[Double]("risky_row_pct") === 0.0)
    assert(en.getAs[Long]("min_l") === 6L)
    val fr = out(1)
    assert(fr.getAs[Long]("n_small_classes") === 1L)
    assert(fr.getAs[Long]("n_risky_rows") === 2L)
    assert(fr.getAs[Double]("risky_row_pct") === 100.0)
    assert(fr.getAs[Long]("min_l") === 1L)
  }

  // ---- Mann–Whitney ---------------------------------------------------

  test("mann-whitney: complete separation closed form; all-tied gives z = 0") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)
    ).toDF("g", "v")
    val r = graft.operators.Eval.mannWhitney(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Double]("u_stat") === 0.0)
    // d2 = -9, sigma2 = 9*7/12; z = -(9-1)/(2*sqrt(5.25))
    val expected = -8.0 / (2.0 * math.sqrt(5.25))
    assert(math.abs(r.getAs[Double]("z") - expected) < 1e-6)
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val t = graft.operators.Eval.mannWhitney(tied, "g", "v", "a", "b").collect().head
    assert(t.getAs[Double]("u_stat") === 2.0) // n1*n2/2
    assert(t.getAs[Double]("z") === 0.0)
  }

  // ---- Poisson bootstrap ----------------------------------------------

  test("poisson bootstrap: deterministic CI brackets the mean") {
    val df = (1 to 200).map(i => (i.toLong, (i % 10 + 1).toDouble / 10.0)).toDF("id", "v")
    val run1 = graft.operators.Eval
      .poissonBootstrapMeanCi(df, "id", "v", reps = 50).collect().head
    val run2 = graft.operators.Eval
      .poissonBootstrapMeanCi(df, "id", "v", reps = 50).collect().head
    assert(run1 === run2) // md5 resampling: bit-identical across runs
    assert(run1.getAs[Long]("n_reps") === 50L)
    val (lo, m, hi) = (run1.getAs[Double]("ci_lo"), run1.getAs[Double]("mean"),
      run1.getAs[Double]("ci_hi"))
    assert(lo < m && m < hi)
    assert(hi - lo < 0.2) // sane width for a bounded metric
  }

  // ---- n-gram novelty -------------------------------------------------

  test("ngram novelty: shared gram not novel, short docs drop out") {
    val docs = Seq(
      (1L, "a b c d"), // grams abc(df2), bcd(df1)
      (2L, "a b c x"), // grams abc(df2), bcx(df1)
      (3L, "z z")      // too short for trigrams
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.ngramNovelty(docs, n = 3)
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_grams") === 2L)
      assert(r.getAs[Long]("n_novel") === 1L)
      assert(r.getAs[Double]("novelty") === 0.5)
    }
  }

  // ---- Session paths --------------------------------------------------

  test("session paths: gap splits sessions, path truncates at 5 steps") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 12:00:00"), 1L, "view"), // > 30 min gap: new session
      (5L, ts("2024-01-02 09:00:00"), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessionize.topSessionPaths(events).collect()
    val m = out.map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions")).toMap
    assert(m === Map("view" -> 2L, "view>click>purchase" -> 1L))
  }

  // ---- Cluster-weighted sampling --------------------------------------

  test("cluster-weighted sample: singletons always kept, sizes audited") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_rep")
    val out = graft.operators.Sampling
      .clusterWeightedSample(docs, clusters)
      .orderBy("cluster_size").collect()
    assert(out.length === 2)
    val s1 = out(0)
    assert(s1.getAs[Long]("cluster_size") === 1L)
    assert(s1.getAs[Long]("n_clusters") === 2L)
    assert(s1.getAs[Long]("n_kept") === 2L) // u * 1 < 2^32 always
    val s2 = out(1)
    assert(s2.getAs[Long]("cluster_size") === 2L)
    assert(s2.getAs[Long]("n_docs") === 2L)
    assert(s2.getAs[Long]("n_kept") <= 2L)
  }

  // ---- Cohort LTV -----------------------------------------------------

  test("cohort LTV: cumulative cents per cohort user") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.00), // Mon week0
      (2L, ts("2024-01-08 10:00:00"), 1L, 2.00), // week1
      (3L, ts("2024-01-02 10:00:00"), 2L, 3.00)  // week0
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.cohortLtv(events).orderBy("week_offset").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("cohort_size") === 2L)
    assert(out(0).getAs[Long]("cum_revenue_cents") === 400L)
    assert(out(0).getAs[Double]("ltv_per_user") === 2.0)
    assert(out(1).getAs[Long]("cum_revenue_cents") === 600L)
    assert(out(1).getAs[Double]("ltv_per_user") === 3.0)
  }

  // ---- Neyman allocation ----------------------------------------------

  test("neyman allocation: zero-variance stratum gets nothing, sum is exact") {
    val df = Seq(
      ("flat", 1L, 5.0), ("flat", 2L, 5.0), ("flat", 3L, 5.0),
      ("wild", 4L, 1.0), ("wild", 5L, 9.0)
    ).toDF("g", "id", "v")
    val out = graft.operators.Sampling.neymanAlloc(df, "g", "v", 100L)
      .orderBy("g").collect()
    assert(out(0).getAs[Long]("alloc") === 0L) // flat: sigma 0
    assert(out(0).getAs[Double]("sigma") === 0.0)
    assert(out(1).getAs[Long]("alloc") === 100L) // wild takes the full budget
    assert(out.map(_.getAs[Long]("alloc")).sum === 100L)
  }

  // ---- BFS levels ------------------------------------------------------

  test("bfs levels: path graph grows one node per hop from the smallest node") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val out = Graph.bfsLevels(edges, hops = 3).orderBy("hop").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L)))
    // star from the center: everything lands at hop 1
    val star = Seq(("a", "x"), ("a", "y"), ("a", "z")).toDF("src", "dst")
    val s = Graph.bfsLevels(star, hops = 3).orderBy("hop").collect()
    assert(s.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((0, 1L), (1, 3L)))
  }

  // ---- WAV codec -------------------------------------------------------

  test("wav codec: closed-form stats from real bytes; corrupt header throws") {
    import graft.operators.Multimodal.WavCodec
    val bytes = WavCodec.synthesizeSquare(0L)
    assert(bytes.length === 44 + 1600)
    val st = WavCodec.decode(0L, bytes)
    assert(st.sample_rate === 8000)
    assert(st.n_samples === 800L)
    assert(st.duration_ms === 100L)
    assert(st.peak === 1000L)
    assert(st.sum_sq === 800L * 1000L * 1000L)
    assert(st.zero_crossings === 39L) // floor(2*200*799/8000)
    val corrupt = bytes.clone(); corrupt(0) = 'X'.toByte
    intercept[IllegalArgumentException] {
      WavCodec.decode(0L, corrupt)
    }
  }

  // ---- Markov attribution ----------------------------------------------

  test("markov attribution: sole converting channel carries removal effect 1") {
    // u1 converts twice through view; u2's click session drops
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (4L, ts("2024-01-01 10:01:00"), 1L, "purchase"),
      (5L, ts("2024-01-01 00:00:00"), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessionize.markovAttribution(events).orderBy("channel").collect()
    val m = out.map(r => r.getAs[String]("channel") ->
      (r.getAs[Double]("base_p"), r.getAs[Double]("removed_p"),
        r.getAs[Double]("removal_effect"))).toMap
    // base: P(start->view)=2/3, P(view->purchase)=1 -> p = 0.666667
    assert(math.abs(m("view")._1 - 0.666667) < 1e-6)
    assert(m("view")._2 === 0.0)
    assert(m("view")._3 === 1.0)
    assert(m("click")._3 === 0.0) // click never converts: cutting it changes nothing
  }

  // ---- Markov transitions --------------------------------------------

  test("transition matrix: row-normalized probabilities and snapped entropy") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "view"),
      (4L, ts("2024-01-01 00:03:00"), 1L, "click"),
      (5L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 00:01:00"), 2L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessionize
      .transitionMatrix(events)
      .orderBy("cur", "nxt")
      .collect()
    val rows = out.map(r =>
      (r.getAs[String]("cur"), r.getAs[String]("nxt"), r.getAs[Long]("n_transitions"),
        r.getAs[Double]("p"))).toSeq
    assert(rows === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 2L, 0.666667),
      ("view", "purchase", 1L, 0.333333)))
    val viewEntropy = out.find(_.getAs[String]("cur") == "view").get.getAs[Double]("cur_entropy")
    val expected = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(viewEntropy - expected) < 1e-5)
    val clickEntropy = out.find(_.getAs[String]("cur") == "click").get.getAs[Double]("cur_entropy")
    assert(clickEntropy === 0.0)
  }
}
