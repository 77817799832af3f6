package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators._

/** Closed-form goldens for the round-9 operators (bounded Bellman–Ford
  * SSSP, isotonic minimax fit, average precision, Cohen's kappa,
  * caliper matching, dyadic decayed counts, SAX words, the
  * column-encoding advisor).
  */
class Round9OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- SSSP (bounded Bellman–Ford) ------------------------------------

  test("sssp: hand graph — shortest paths, horizon bound, unreachable NULL") {
    //   0 -5-> 1 -1-> 2      0 -10-> 2 (longer direct edge)
    //   3 isolated
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 10L))
      .toDF("src", "dst", "w")
    val d2 = Graph.ssspBellmanFord(nodes, edges, source = 0L, rounds = 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(d2(0L) === Some(0L))
    assert(d2(1L) === Some(5L))
    assert(d2(2L) === Some(6L)) // via 1, not the direct 10
    assert(d2(3L) === None)
    // one round only sees direct edges: 2 is reached at cost 10
    val d1 = Graph.ssspBellmanFord(nodes, edges, source = 0L, rounds = 1)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(d1(2L) === Some(10L))
  }

  // ---- Isotonic minimax fit -------------------------------------------

  test("isotonic: violator run pools to the weighted average; fit is monotone") {
    // bins: rate(0)=0.2 (5 rows 1 pos), rate(1)=0.8 (5 rows 4 pos),
    //       rate(2)=0.4 (5 rows 2 pos)  -> bins 1,2 pool to 6/10 = 0.6
    val rows = (Seq.fill(4)((0L, 0L)) ++ Seq((0L, 1L)) ++
      Seq.fill(4)((1L, 1L)) ++ Seq((1L, 0L)) ++
      Seq.fill(3)((2L, 0L)) ++ Seq.fill(2)((2L, 1L))).toDF("bin", "y")
    val fit = Isotonic.isotonicRates(rows, col("bin"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(fit(0L) === 0.2)
    assert(fit(1L) === 0.6)
    assert(fit(2L) === 0.6)
  }

  test("isotonic: already-monotone rates are returned unchanged and monotone") {
    val rows = (Seq.fill(9)((0L, 0L)) ++ Seq((0L, 1L)) ++
      Seq.fill(5)((1L, 0L)) ++ Seq.fill(5)((1L, 1L)) ++
      Seq.fill(1)((2L, 0L)) ++ Seq.fill(9)((2L, 1L))).toDF("bin", "y")
    val out = Isotonic.isotonicRates(rows, col("bin"), col("y"))
      .orderBy("bin").collect()
    val iso = out.map(_.getDouble(4))
    assert(iso.toSeq === Seq(0.1, 0.5, 0.9))
    assert(iso.sliding(2).forall(p => p(0) <= p(1)))
  }

  // ---- Average precision ----------------------------------------------

  test("average precision: perfect ranking = 1, hand case matches sklearn sum form") {
    val perfect = Seq(
      ("g", 0.9, 1L, 1L), ("g", 0.8, 2L, 1L), ("g", 0.2, 3L, 0L), ("g", 0.1, 4L, 0L))
      .toDF("grp", "score", "id", "y")
    val apPerfect = Eval.averagePrecision(perfect, "grp", "score", "id", "y")
      .collect().head.getDouble(3)
    assert(apPerfect === 1.0)
    // ranking pos at ranks 1 and 3: AP = (1/1 + 2/3)/2 = 0.833333
    val hand = Seq(
      ("g", 0.9, 1L, 1L), ("g", 0.8, 2L, 0L), ("g", 0.7, 3L, 1L), ("g", 0.1, 4L, 0L))
      .toDF("grp", "score", "id", "y")
    val ap = Eval.averagePrecision(hand, "grp", "score", "id", "y")
      .collect().head.getDouble(3)
    assert(math.abs(ap - 0.833333) < 1e-6)
  }

  // ---- Cohen's kappa --------------------------------------------------

  test("kappa: perfect agreement = 1; hand 2x2 matches the closed form") {
    val agree = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    assert(Eval.cohensKappa(agree, col("a"), col("b")).collect().head.getDouble(6) === 1.0)
    // n=10: n11=4, n10=1, n01=2, n00=3 -> po=0.7
    // pe = (5*6 + 4*5)/100 = 0.5 -> kappa = 0.4
    val rows = (Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))).toDF("a", "b")
    val k = Eval.cohensKappa(rows, col("a"), col("b")).collect().head
    assert(k.getDouble(5) === 0.7)
    assert(k.getDouble(6) === 0.4)
  }

  // ---- Caliper matching -----------------------------------------------

  test("matching: nearest control, tie to lower side, caliper excludes, ATT exact") {
    // block A: treated x=10 (controls at 7 and 12 -> nearest 12? |10-7|=3,
    //   |12-10|=2 -> next side), treated x=100 with nearest control 7/12 ->
    //   far beyond caliper 5 -> unmatched.
    // block B: treated x=20, controls at 18 and 22 (tie) -> prev (18).
    val rows = Seq(
      ("A", 1L, 0L, 7L, 70L), ("A", 2L, 0L, 12L, 120L),
      ("A", 3L, 1L, 10L, 100L), ("A", 4L, 1L, 100L, 999L),
      ("B", 5L, 0L, 18L, 10L), ("B", 6L, 0L, 22L, 20L),
      ("B", 7L, 1L, 20L, 30L)
    ).toDF("block", "id", "t", "x", "y")
    val out = Matching.nearestCaliperAtt(rows, caliper = 5L).collect().head
    assert(out.getLong(0) === 3L) // treated
    assert(out.getLong(1) === 2L) // matched (x=100 outside caliper)
    // matches: (y=100 vs control 120) dx=2, (y=30 vs control 10) dx=2
    assert(out.getDouble(3) === 2.0)
    assert(out.getDouble(4) === 0.0) // ((100-120) + (30-10)) / 2
  }

  // ---- Decayed counts -------------------------------------------------

  test("decayed counts: dyadic weights sum exactly") {
    val events = Seq(
      ("a", ts("2024-01-03 10:00:00")), // age 0 -> 1
      ("a", ts("2024-01-02 10:00:00")), // age 1 -> 0.5
      ("a", ts("2024-01-01 10:00:00")), // age 2 -> 0.25
      ("b", ts("2024-01-03 23:00:00")) // age 0 -> 1
    ).toDF("event_type", "ts")
    val out = Timeseries.decayedCounts(events, "event_type")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") === 1.75)
    assert(out("b") === 1.0)
  }

  // ---- SAX words ------------------------------------------------------

  test("sax: constant series maps to one symbol; ramp orders symbols") {
    // key c: same count every day -> z=0 everywhere -> all 'c'
    val const = (0 until 10).flatMap(d =>
      Seq.fill(3)(("k", ts(f"2024-01-${d + 1}%02d 10:00:00"))))
      .toDF("event_type", "ts")
    val w1 = Timeseries.saxWords(const, "event_type", frameDays = 5)
      .collect().head
    assert(w1.getLong(1) === 10L) // n_days
    assert(w1.getLong(2) === 2L) // n_frames
    assert(w1.getString(3) === "cc")
    // ramp: day d has d+1 events over 10 days -> first frame below mean,
    // second above: strictly increasing symbols
    val ramp = (0 until 10).flatMap(d =>
      Seq.fill(d + 1)(("k", ts(f"2024-01-${d + 1}%02d 10:00:00"))))
      .toDF("event_type", "ts")
    val w2 = Timeseries.saxWords(ramp, "event_type", frameDays = 5)
      .collect().head.getString(3)
    assert(w2.length === 2 && w2(0) < w2(1))
  }

  // ---- Encoding advisor -----------------------------------------------

  test("encoding advisor: exact byte math on a hand table") {
    // 6 rows, layout (p, o); audited: flag (string), qty (8-byte).
    // flag: AAB / BBB by layout -> runs: p1: A,A,B = 2; p2: B,B,B = 1 -> 3
    //   distinct 2, dict_data 2, plain = strlen sum 6
    //   dict = 2 + 6*1 = 8 ; rle = 2 + 3*(1+4) = 17 -> plain wins
    // qty: 1,1,2 / 2,2,2 -> runs 2 + 1 = 3, distinct 2
    //   plain = 48, dict = 16 + 6 = 22, rle = 16 + 15 = 31 -> dict wins
    val rows = Seq(
      (1L, 1, "A", 1L), (1L, 2, "A", 1L), (1L, 3, "B", 2L),
      (2L, 1, "B", 2L), (2L, 2, "B", 2L), (2L, 3, "B", 2L)
    ).toDF("p", "o", "flag", "qty")
    val out = EncodingAdvisor
      .advise(rows, Seq(("flag", 0), ("qty", 8)), partCol = "p", ordCol = "o")
      .collect().map(r => r.getString(0) -> r).toMap
    val flag = out("flag")
    assert(flag.getLong(2) === 2L) // distinct
    assert(flag.getLong(3) === 3L) // runs
    assert(flag.getLong(4) === 6L) // plain
    assert(flag.getLong(5) === 8L) // dict
    assert(flag.getLong(6) === 17L) // rle
    assert(flag.getString(7) === "plain")
    val qty = out("qty")
    assert(qty.getLong(4) === 48L)
    assert(qty.getLong(5) === 22L)
    assert(qty.getLong(6) === 31L)
    assert(qty.getString(7) === "dict")
  }

  test("encoding advisor: constant column under a non-unique layout key is one run per partition") {
    // 100 identical 10-byte values in 2 partitions (the layout key is
    // non-unique on purpose): runs = 2, plain = 1000, dict = 10 + 100,
    // rle = 10 + 2*(1+4) = 20 -> rle_dict wins decisively.
    val rows = (1 to 100).map(i => ((i % 2).toLong, 1, "XXXXXXXXXX"))
      .toDF("p", "o", "c")
    val out = EncodingAdvisor.advise(rows, Seq(("c", 0)), "p", "o")
      .collect().head
    assert(out.getLong(3) === 2L) // one run per partition
    assert(out.getLong(6) === 20L)
    assert(out.getString(7) === "rle_dict")
  }

  // ---- Cumulative distinct --------------------------------------------

  test("cumulative distinct: a returning id counts only on its first day") {
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-02 08:00:00")), (3L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-03 08:00:00")), (2L, ts("2024-01-03 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Timeseries.cumulativeDistinct(events, "user_id")
      .orderBy("day").collect()
    assert(out.map(_.getLong(3)).toSeq === Seq(2L, 3L, 3L)) // cum_ids
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L, 0L)) // new_ids
  }

  // ---- Bitmap segments ------------------------------------------------

  test("bitmap intersections: exact set algebra incl. word boundary and duplicates") {
    // A = {1, 62, 63, 126}; B = {62, 63, 200}; 63 and 126 cross the
    // 63-bit word boundary; duplicate memberships must not double-count.
    val rows = (Seq(1L, 62L, 63L, 126L, 62L).map(("A", _)) ++
      Seq(62L, 63L, 200L, 200L).map(("B", _))).toDF("seg", "id")
    val out = graft.operators.Bitmap.intersections(rows, "seg", "id").collect().head
    assert(out.getLong(2) === 4L) // |A|
    assert(out.getLong(3) === 3L) // |B|
    assert(out.getLong(4) === 2L) // |A ∩ B| = {62, 63}
    assert(out.getLong(5) === 5L) // |A ∪ B|
    assert(out.getDouble(6) === 0.4)
  }

  // ---- Personalized PageRank ------------------------------------------

  test("personalized pagerank: hand-computed 2-iteration chain from a delta seed") {
    // chain 0 -> 1 -> 2, 3 isolated; seed = {0}, so r0 = (1, 0, 0, 0).
    // iter1: (0.15, 0.85, 0, 0); iter2: (0.15, 0.1275, 0.7225, 0) —
    // synchronous iterations push the delta mass DOWN the chain; decay
    // toward the seed is a stationary-limit property, not a 2-step one.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val r = Graph.personalizedPageRank(nodes, edges, seeds, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(0L) - 0.15) < 1e-9)
    assert(math.abs(r(1L) - 0.1275) < 1e-9)
    assert(math.abs(r(2L) - 0.7225) < 1e-9)
    assert(r(3L) === 0.0) // unreachable from the teleport set
  }

  // ---- Fellegi–Sunter -------------------------------------------------

  test("fellegi–sunter: hand-computed weights and decision bands") {
    // one block; field f1: A=[1,2], B=[1,3] -> u1 = 1/4
    //   wa1 = log2(.9/.25) ~ 1.848, wd1 = log2(.1/.75) ~ -2.907
    // field f2 constant 5 both sides -> u2 clamped to 1-2^-30
    //   wa2 ~ log2(.9) = -0.152, wd2 huge positive (never taken)
    // pair (1,5)x(1,5): 1.848 - 0.152 = 1.696  -> possible
    // other 3 pairs:   -2.907 - 0.152 = -3.059 -> non-link
    val a = Seq((0L, 1L, 5L), (0L, 2L, 5L)).toDF("block", "f1", "f2")
    val b = Seq((0L, 1L, 5L), (0L, 3L, 5L)).toDF("block", "f1", "f2")
    val out = graft.operators.RecordLinkage
      .fellegiSunter(a, b, "block", Seq("f1", "f2"))
      .collect().head
    assert(out.getLong(0) === 4L)
    assert(out.getLong(1) === 0L) // links
    assert(out.getLong(2) === 1L) // possible
    assert(out.getLong(3) === 3L) // non-links
    assert(math.abs(out.getDouble(4) - (-3.058894)) < 1e-5)
    assert(math.abs(out.getDouble(5) - 1.695994) < 1e-5)
  }

  test("fellegi–sunter: NULL field values count in the u estimate (null-safe)") {
    // f constant NULL both sides: scoring's <=> calls every pair an
    // agreement, so u must clamp to 1-2^-30 (chance agreement certain)
    // exactly like a constant non-null field → wa = log2(0.9) ≈ -0.152.
    // An equality-joined u estimate would drop the NULL bucket, get
    // u = eps, and hand every pair a spurious +29.7 "agreement" weight.
    val a = Seq((0L, Option.empty[Long]), (0L, Option.empty[Long])).toDF("block", "f")
    val b = Seq((0L, Option.empty[Long])).toDF("block", "f")
    val out = graft.operators.RecordLinkage
      .fellegiSunter(a, b, "block", Seq("f"))
      .collect().head
    assert(out.getLong(0) === 2L)
    assert(math.abs(out.getDouble(5) - math.log(0.9) / math.log(2.0)) < 1e-5)
  }

  // ---- Quarantine write -----------------------------------------------

  test("quarantine write: one-scan routing, multi-violation annotation, null = violation") {
    val rows = Seq(
      (1L, 10.0, "ok"),
      (2L, -1.0, "neg"), // fails nonneg
      (3L, 10.0, null), // null predicate -> violation
      (4L, -5.0, null) // fails both
    ).toDF("id", "v", "tag")
    val path = java.nio.file.Files
      .createTempDirectory("graft_quarantine").resolve("t").toString
    graft.sources.LakeWriter.writeWithQuarantine(
      rows,
      rules = Seq(("nonneg", col("v") >= 0), ("tagged", col("tag").isNotNull)),
      path = path)
    val back = spark.read.parquet(path)
    // partition values round-trip as strings (Spark's partition-type
    // inference has no boolean case) — the filter below still prunes
    val byId = back.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (r.getString(r.fieldIndex("__violations")), r.getString(r.fieldIndex("__valid"))))
      .toMap
    assert(byId(1L) === (("", "true")))
    assert(byId(2L) === (("nonneg", "false")))
    assert(byId(3L) === (("tagged", "false")))
    assert(byId(4L) === (("nonneg,tagged", "false")))
    // the clean lane is a partition — a pruned read sees only valid rows
    val clean = spark.read.parquet(path).filter(col("__valid") === "true")
    assert(clean.count() === 1L)
  }

  // ---- CMH ------------------------------------------------------------

  test("cmh: two identical strata reproduce the per-stratum odds ratio and chi2") {
    // per stratum: a=10 b=5 c=5 d=5 -> OR 2; E=9, V=1.5
    // pooled: OR_MH = 4/2 = 2; chi2 = (20-18)^2 / 3 = 4/3
    def stratum(s: String) =
      Seq.fill(10)((s, true, true)) ++ Seq.fill(5)((s, true, false)) ++
        Seq.fill(5)((s, false, true)) ++ Seq.fill(5)((s, false, false))
    val df = (stratum("s1") ++ stratum("s2")).toDF("s", "e", "o")
    val out = Eval.cmhOddsRatio(df, col("s"), col("e"), col("o")).collect().head
    assert(out.getLong(0) === 2L)
    assert(out.getLong(1) === 50L)
    assert(out.getDouble(2) === 2.0)
    assert(math.abs(out.getDouble(3) - 4.0 / 3.0) < 1e-6)
  }

  // ---- Next-event accuracy --------------------------------------------

  test("next-event accuracy: temporal split, argmax model, exact scoring") {
    val events = Seq(
      // user 1: train day pairs A->B, B->A (pair crossing midnight is
      // train because its CUR event is on day 0); eval pairs A->B, B->A
      (1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (2L, 1L, "B", ts("2024-01-01 11:00:00")),
      (3L, 1L, "A", ts("2024-01-02 10:00:00")),
      (4L, 1L, "B", ts("2024-01-02 11:00:00")),
      (5L, 1L, "A", ts("2024-01-02 12:00:00")),
      // user 2: train A->B, B->A; eval A->A (model says A->B: wrong)
      (6L, 2L, "A", ts("2024-01-01 10:00:00")),
      (7L, 2L, "B", ts("2024-01-01 11:00:00")),
      (8L, 2L, "A", ts("2024-01-02 10:00:00")),
      (9L, 2L, "A", ts("2024-01-02 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.nextEventAccuracy(events, splitDays = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getString(1) === "B")
    assert(out("A").getLong(2) === 2L) // eval pairs from cur A
    assert(out("A").getLong(3) === 1L)
    assert(out("A").getDouble(4) === 0.5)
    assert(out("B").getString(1) === "A")
    assert(out("B").getLong(2) === 1L)
    assert(out("B").getDouble(4) === 1.0)
  }

  // ---- aHash near-dup -------------------------------------------------

  test("ahash: identical payloads pair at hamming 0; distinct content stays apart") {
    import graft.operators.Multimodal
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val text = "the quick brown fox jumps over the lazy dog " * 4
    val other = ("z" * 60) + ("a" * 60) + ("z" * 60)
    val media = Seq(mk(1L, text), mk(2L, text), mk(3L, other))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.aHashNearDup(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
    // hashes themselves: w0/w1 carry no sign bit (portable shifts)
    val h = Multimodal.imageAHash(media).collect()
    assert(h.forall(r => r.getLong(1) >= 0L && r.getLong(2) >= 0L))
  }

  // ---- Position-based attribution -------------------------------------

  test("position attribution: 40/20/40 split with 1- and 2-touch edge rules") {
    // u1: A B C purchase -> A 0.4, B 0.2, C 0.4
    // u2: A purchase     -> A 1.0
    // u3: B C purchase   -> B 0.5, C 0.5
    // u4: A B (no purchase) -> nothing
    val events = Seq(
      (1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (2L, 1L, "B", ts("2024-01-01 10:01:00")),
      (3L, 1L, "C", ts("2024-01-01 10:02:00")),
      (4L, 1L, "purchase", ts("2024-01-01 10:03:00")),
      (5L, 2L, "A", ts("2024-01-01 10:00:00")),
      (6L, 2L, "purchase", ts("2024-01-01 10:01:00")),
      (7L, 3L, "B", ts("2024-01-01 10:00:00")),
      (8L, 3L, "C", ts("2024-01-01 10:01:00")),
      (9L, 3L, "purchase", ts("2024-01-01 10:02:00")),
      (10L, 4L, "A", ts("2024-01-01 10:00:00")),
      (11L, 4L, "B", ts("2024-01-01 10:01:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.positionAttribution(events)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A") === ((2L, 1.4)))
    assert(out("B") === ((2L, 0.7)))
    assert(out("C") === ((2L, 0.9)))
    assert(!out.contains("purchase"))
  }

  // ---- Holt linear trend ----------------------------------------------

  test("holt: hand-computed dyadic fold on a 3-day series, zero-filled gap") {
    // counts: day0=4, day1=0 (gap), day2=8
    // t=1: err |0-4|=4;   l=0.5*0+0.5*4=2,   b=0.5*(2-4)+0 = -1
    // t=2: err |8-1|=7;   l=0.5*8+0.5*1=4.5, b=0.5*(4.5-2)+0.5*(-1)=0.75
    // mae=(4+7)/2=5.5, forecast_1=5.25, forecast_3=6.75
    val events = (Seq.fill(4)(ts("2024-01-01 10:00:00")) ++
      Seq.fill(8)(ts("2024-01-03 10:00:00"))).map(Tuple1(_)).toDF("ts")
    val out = Timeseries.holtLinear(events).collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getDouble(1) === 4.5) // level
    assert(out.getDouble(2) === 0.75) // trend
    assert(out.getDouble(3) === 5.25)
    assert(out.getDouble(4) === 6.75)
    assert(out.getDouble(5) === 5.5)
  }
}
