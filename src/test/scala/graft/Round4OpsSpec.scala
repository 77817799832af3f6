package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GroupTopK, Pii, Winnow}

/** Round-4 operators: k-bounded top-k per group (vs the window-function
  * formulation it replaces), winnowing passage overlap (detection
  * guarantee + postings cap), and PII redaction arithmetic.
  */
class Round4OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------ GroupTopK

  test("topKPerGroup equals the row_number window formulation, ties broken by id") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map(i => (s"g${i % 7}", i, rnd.nextInt(40).toDouble))
    val df = rows.toDF("g", "id", "v") // nextInt(40): many exact ties
    val got = GroupTopK
      .topKPerGroup(df, Seq("g"), col("v"), col("id"), k = 5)
      .select("g", "rank", "id", "v")
      .as[(String, Int, Long, Double)]
      .collect()
      .toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select("g", "rank", "id", "v")
      .as[(String, Int, Long, Double)]
      .collect()
      .toSet
    assert(got == want)
  }

  test("topKPerGroup with k larger than the group returns the whole group, ranked") {
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 9.0), ("b", 3L, 1.0)).toDF("g", "id", "v")
    val got = GroupTopK
      .topKPerGroup(df, Seq("g"), col("v"), col("id"), k = 10)
      .select("g", "rank", "id")
      .as[(String, Int, Long)]
      .collect()
      .toSet
    assert(got == Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 3L)))
  }

  test("TopKAgg merge keeps the global best k across disjoint partials") {
    val agg = new GroupTopK.TopKAgg(3)
    import GroupTopK.{ScoredId, TopKBuf}
    val a = Seq(9.0 -> 1L, 7.0 -> 2L, 5.0 -> 3L)
    val b = Seq(8.0 -> 4L, 7.0 -> 1L, 6.0 -> 5L) // 7.0 tie: id 1 beats id 2
    def buf(s: Seq[(Double, Long)]) = TopKBuf(s.map { case (v, i) => ScoredId(v, i) })
    val merged = agg.merge(buf(a), buf(b))
    assert(merged.items == Seq(ScoredId(9.0, 1L), ScoredId(8.0, 4L), ScoredId(7.0, 1L)))
  }

  // --------------------------------------------------------------- Winnow

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("winnowing guarantee: a shared run of n+w-1 tokens yields a shared fingerprint") {
    // n=4, w=4: any shared 7-token run must contribute >= 1 shared
    // fingerprint (the window over the run's 4 shingles has one minimum,
    // selected in both docs)
    val run = "alpha beta gamma delta epsilon zeta eta"
    val d = docsDF(
      1L -> s"one two three four five six seven $run",
      2L -> s"$run red orange yellow green blue indigo violet"
    )
    val pairs = Winnow
      .overlapPairs(d, minShared = 1, maxDocFreq = 64)
      .select("doc_a", "doc_b")
      .as[(Long, Long)]
      .collect()
    assert(pairs.contains((1L, 2L)))
  }

  test("unrelated docs share no fingerprints; short docs are dropped") {
    val d = docsDF(
      1L -> "aa bb cc dd ee ff gg hh ii jj",
      2L -> "kk ll mm nn oo pp qq rr ss tt",
      3L -> "too short for a window" // 5 tokens < n + w - 1 = 7
    )
    assert(Winnow.overlapPairs(d, minShared = 1).count() == 0L)
    assert(
      Winnow.fingerprints(d).select("doc_id").distinct().as[Long].collect().toSet == Set(1L, 2L))
  }

  test("maxDocFreq drops boilerplate fingerprints from pairing") {
    // the same 10-token text in 5 docs: every fingerprint has df=5, so a
    // cap of 4 suppresses every pair; the default cap keeps them
    val txt = "the quick brown fox jumps over the lazy sleeping dog"
    val d = docsDF((1L to 5L).map(i => i -> txt): _*)
    assert(Winnow.overlapPairs(d, minShared = 1, maxDocFreq = 4).count() == 0L)
    assert(Winnow.overlapPairs(d, minShared = 1, maxDocFreq = 64).count() == 10L) // C(5,2)
  }

  // ----------------------------------------------------- as-of variants

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 10:$min%02d:00")

  test("asOfForward picks the earliest right row at-or-after, inclusive, max tie-break") {
    val l = Seq((1L, 1L, t(10)), (2L, 1L, t(40)), (3L, 2L, t(5))).toDF("lid", "k", "ts")
    val r = Seq(
      (1L, t(10), 100L), // equal time: visible to lid 1
      (1L, t(10), 101L), // simultaneous: larger id wins
      (1L, t(30), 102L), // before lid 2: invisible forward
      (2L, t(1), 200L) // only a PAST row for key 2: lid 3 unmatched
    ).toDF("k2", "rts", "rid")
    val got = graft.operators.AsOfJoin
      .asOfForward(l, r, "k", "k2", "ts", "rts",
        rightValueCols = Seq("rid" -> "next_id"), rightTieBreak = Seq("rid"))
      .select("lid", "next_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(101L), 2L -> None, 3L -> None))
  }

  test("asOfNearest picks min |Δt|, backward wins ties, unmatched keys null") {
    val l = Seq(
      (1L, 1L, t(20)), // backward at 10 (Δ10) vs forward at 40 (Δ20) → 10
      (2L, 1L, t(35)), // backward at 10 (Δ25) vs forward at 40 (Δ5) → 40
      (3L, 1L, t(25)), // exact tie Δ15/Δ15 → backward wins
      (4L, 2L, t(5)) // key 2 has no right rows at all
    ).toDF("lid", "k", "ts")
    val r = Seq((1L, t(10), 100L), (1L, t(40), 101L)).toDF("k2", "rts", "rid")
    val got = graft.operators.AsOfJoin
      .asOfNearest(l, r, "k", "k2", "ts", "rts",
        rightValueCols = Seq("rid" -> "near_id"), rightTieBreak = Seq("rid"))
      .select("lid", "near_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> Some(100L), 4L -> None))
  }

  test("asOfTolerance nulls stale matches, keeps fresh ones") {
    val l = Seq((1L, 1L, t(30)), (2L, 1L, t(59))).toDF("lid", "k", "ts")
    val r = Seq((1L, t(25), 7L)).toDF("k2", "rts", "rid")
    val got = graft.operators.AsOfJoin
      .asOfTolerance(l, r, "k", "k2", "ts", "rts",
        rightValueCols = Seq("rid" -> "last_id"), tolerance = "10 minutes")
      .select("lid", "last_id")
      .as[(Long, Option[Long])].collect().toMap
    // lid 1: 5 min stale → kept; lid 2: 34 min stale → nulled
    assert(got == Map(1L -> Some(7L), 2L -> None))
  }

  // ------------------------------------------------------------------ PII

  test("redact finds and replaces emails, IPv4s, SSNs; counts match") {
    val d = Seq(
      (1L, "reach me at jo.doe+spam@mail.example.org or 192.168.0.1 ssn 123-45-6789"),
      (2L, "no pii here, just 1.2 version numbers and an at sign @ alone"),
      (3L, "two mails: a@b.io c@d.co and ips 10.0.0.1 10.0.0.2")
    ).toDF("doc_id", "text")
    val r = Pii.redact(d).select("doc_id", "n_email", "n_ip", "n_ssn", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(r(0)._2 == 1 && r(0)._3 == 1 && r(0)._4 == 1)
    assert(r(0)._5 == "reach me at <EMAIL> or <IP> ssn <SSN>")
    assert(r(1)._2 == 0 && r(1)._3 == 0 && r(1)._4 == 0)
    assert(r(1)._5 == "no pii here, just 1.2 version numbers and an at sign @ alone")
    assert(r(2)._2 == 2 && r(2)._3 == 2 && r(2)._4 == 0)
    assert(r(2)._5 == "two mails: <EMAIL> <EMAIL> and ips <IP> <IP>")
  }
}
