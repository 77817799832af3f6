package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and yields rows; entry()
  * yields the one-row summary. Value-level correctness is checked by the
  * DuckDB oracle (driver + scripts/local_verify.py).
  */
class QueriesSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose final plan intentionally nested-loops against a side
    * that is bounded by construction but not PROVABLY bounded from the
    * plan shape alone (e.g. a filter on a base scan that selects a
    * fixed 10-probe set, or a per-source/per-day aggregate whose
    * cardinality is a dimension, not the corpus). Every entry carries
    * the reason it is safe; all audited r9 via PlanDump — none crosses
    * two corpus-sized relations (the q390 class stays banned).
    */
  private val plannedNestedLoopAllowed: Map[String, String] = Map(
    // --- fixed probe-set × corpus (linear in corpus; probe side is the
    //     documented 10-row query set, broadcast) ---
    "q30_ann_brute" -> "10-probe set × corpus with vec_id<>query_id — the documented exact-topk baseline",
    "q80_ann_pq" -> "10-probe set × PQ-coded corpus — documented flat ADC scan baseline; q123 is the scale path",
    "q141_contrastive" -> "10-probe set × corpus negatives (vec_id<>query_id) — linear in corpus",
    "q153_rrf_fusion" -> "10-probe set × corpus per retriever — linear in corpus",
    "q235_retrieval_eval" -> "10-probe set × corpus exact ranking for eval — linear in corpus",
    "q241_embedding_drift" -> "bounded centroid relation × dim grid — model-state product",
    "q266_knn_eval" -> "10-probe set × corpus (vec_id<>query_id) exact kNN reference — linear in corpus",
    // --- group/grid-dimension products (per-source totals × value grid,
    //     calendar × arms, bins × bins — dimension-sized, never corpus²) ---
    "q149_ks_drift" -> "per-source totals (≤#sources) × distinct-value CDF grid — KS construction",
    "q189_js_drift" -> "per-source totals × binned-distribution grid — JS construction",
    "q164_kmv_intersect" -> "k-minima sketch (k=const) inequality self-pair — k² not corpus²",
    "q249_logrank" -> "event-time grid × arm totals — survival-table product",
    "q274_naive_bayes" -> "class-prior relation (≤#classes) × feature-likelihood grid",
    "q280_label_noise" -> "class×class confusion grid product — dimension-sized",
    "q290_jenks_breaks" -> "value-grid × break-candidate grid — grid-sized dynamic program",
    "q303_mann_kendall" -> "daily series self-pairs (t<t') — calendar-grid O(T²), T=#days",
    "q307_parallel_trends" -> "period grid × arm totals with a time-window predicate",
    "q309_isotonic" -> "bin-interval self-join (j<=i<=k) — PAVA over ≤20 bins",
    "q339_kendall_tau" -> "group-pair inequality join over per-group aggregates — groups², groups=dimension",
    "q346_friedman" -> "block×treatment rank grid product — dimension-sized",
    "q361_cooks_distance" -> "per-point × regression-scalars product — scalar side is a 1-row model",
    "q430_loo_valuation" -> "coalition/fold table × per-fold stats — bounded model state",
    "q463_maxscore_prune" -> "8-term postings × 1-row theta/threshold relations — term-sized",
    "q469_t_closeness" -> "global sensitive distribution (≤#classes) × QI-group grid",
    "q482_krippendorff_alpha" -> "category×category coincidence grid (≤3 return flags) inequality pair — dimension-sized",
    "q486_sinkhorn_ot" -> "word-length histogram grid (≤15×≤15 bins) kernel product — dimension-sized Sinkhorn grid",
    "q493_ransac_line" -> "50-trial × daily-point grid (calendar-bounded ≤50×31) inlier scoring — dimension-sized",
    // --- deliberate non-equi subquery surface ---
    "q375_subquery_predicates" -> "demonstrates correlated/non-equi subquery predicates over dimension tables"
  )

  test("entry() produces a non-empty summary") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("total_requests_processed") > 0L)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"query $name returned no rows")
      // Rows-only queries go through the driver's pandas capture, which
      // sorts every column — a non-atomic column (array/struct/map) is
      // unhashable there and turns the row into a harness crash (the
      // round-4 q42 regression). Oracle-checked queries hit the same
      // sort path, so the contract is universal: scalar columns only.
      import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
      val nonScalar = df.schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(
        nonScalar.isEmpty,
        s"query $name emits non-scalar columns ${nonScalar.map(_.name).mkString(", ")} — " +
          "unsortable by the driver's capture layer")
      // DECIMAL outputs are banned: Spark and DuckDB widen decimal
      // aggregates differently (sum(DECIMAL(18,2)) → DECIMAL(28,2) vs
      // DECIMAL(38,2)/HUGEINT) and decimal values serialize differently
      // through the driver's hash even when every cell is equal — this
      // class cost three rounds of q256/q391/q392 hash mismatches with
      // zero differing cells. Emit DOUBLE (snapped) or BIGINT
      // integer-cents instead; decimals may still be used INSIDE a plan
      // for exact intermediate arithmetic.
      val decimals = df.schema.fields.filter(_.dataType.isInstanceOf[DecimalType])
      assert(
        decimals.isEmpty,
        s"query $name emits DECIMAL columns ${decimals.map(_.name).mkString(", ")} — " +
          "not hash-portable through the driver's capture layer (cast to DOUBLE " +
          "or emit BIGINT integer units)")
      // Plan-shape gate (the decimal-ban move applied to join shape): no
      // BroadcastNestedLoopJoin/CartesianProduct against an UNBOUNDED
      // side anywhere in the final plan. Scalar broadcasts (cross join
      // with an ungrouped aggregate / LIMIT-1 relation) pass — they are
      // linear. A query that loses its equi-key silently degrades into
      // the quadratic class (the q390 r7 lesson); on 100 TB that is a
      // cluster-week, not a slow query.
      if (!plannedNestedLoopAllowed.contains(name)) {
        val bad = graft.plans.PlanGuard.unboundedOffenders(df)
        assert(
          bad.isEmpty,
          s"query $name plans non-scalable join(s) ${bad.mkString(", ")} — " +
            "add an equi-key, or whitelist with a written safety argument")
      }
    }
  }

  test("oracle SQL map only references declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("nested-loop whitelist only references declared queries") {
    val stale = plannedNestedLoopAllowed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale whitelist entries: ${stale.mkString(", ")}")
  }
}
