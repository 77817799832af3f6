package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale properties the engine is designed
  * around must be visible in the executed plan, not just intended —
  * filters/projections reach the parquet scan, dimension joins broadcast,
  * top-k avoids a global sort, aggregates run partial+final.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString()
  }

  test("q2 filter/projection push down to the parquet scan") {
    val plan = planOf(SparkEntry.queries("q2_filter_project")(spark, sfDir))
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("l_discount"), "discount predicate not pushed")
    // Column pruning: only 5 of 11 lineitem columns should be read.
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_partkey"), "unpruned column l_partkey in scan")
  }

  test("q6 dimension joins are broadcast, not shuffled") {
    val plan = planOf(SparkEntry.queries("q6_join_chain")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "dimension join not broadcast")
    assert(!plan.contains("SortMergeJoin"), "unexpected sort-merge join in dim chain")
  }

  test("q5 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(SparkEntry.queries("q5_topk")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("q1 aggregate runs partial+final hash aggregation") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sfDir))
    assert(plan.contains("HashAggregate"), "no hash aggregate")
    assert(plan.toLowerCase.contains("partial_"), "no partial (map-side) aggregation")
  }

  test("q7 anti join stays a broadcast join at this scale") {
    val plan = planOf(SparkEntry.queries("q7_anti_join")(spark, sfDir))
    assert(plan.contains("LeftAnti"), "anti join not planned as anti join")
  }

  test("whole-stage codegen spans the scan-filter-project pipeline of q2") {
    // Codegen stages render as "*(n) Op" prefixes in the executed plan.
    val plan = planOf(SparkEntry.queries("q2_filter_project")(spark, sfDir))
    assert(plan.contains("*("), "no codegen stage")
  }

  test("rolling_hash64 participates in codegen (no UDF boxing)") {
    graft.functions.RollingHash64.register(spark)
    val df = graft.sources.Tables
      .documents(spark, sfDir)
      .selectExpr("rolling_hash64(text) AS fp")
    val plan = planOf(df)
    assert(plan.contains("*("), "expression fell out of codegen")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), "UDF in plan")
  }

  test("minhash shingle scan prunes the documents read to (doc_id, text)") {
    // The signature kernel needs only the id and the text — the scan must
    // not drag source/lang/n_chars through the shingle relation. q26's
    // final plan no longer shows the scan (the shingle relation is
    // localCheckpoint-materialized, truncating lineage), so the audit
    // targets the plan that RUNS at materialization time: the shingle
    // operator's own.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val plan = planOf(
      graft.operators.Dedup.hashedTokenShingles(docs, 3)
        .filter(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("shingles")) > 0))
    assert(plan.contains("ReadSchema"), plan.linesIterator.take(3).mkString("\n"))
    assert(!plan.contains("n_chars"), "unpruned column n_chars in dedup scan")
    assert(!plan.contains("source"), "unpruned column source in dedup scan")
  }

  test("q26 band self-join is a keyed equi-join, never a cartesian product") {
    val plan = planOf(SparkEntry.queries("q26_minhash_lsh")(spark, sfDir))
    assert(
      !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to an O(n²) join"
    )
  }

  test("q29 verification broadcasts the vector relation, not the candidate stream") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val plan = planOf(graft.operators.Dedup.embeddingNearDupPairs(emb))
    assert(plan.contains("BroadcastHashJoin"), "vector lookup not broadcast")
    assert(!plan.contains("CartesianProduct"), "O(n²) verification join")
  }

  test("lake writer layout: partition pruning reaches the scan, rows intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_lake").toString + "/events"
    graft.sources.LakeWriter.writeEventsLake(spark, sfDir, out)
    val lake = spark.read.parquet(out)
    // Pruning: a filter on the partition column appears as PartitionFilters
    // in the scan, not as a post-scan Filter over all partitions.
    val pruned = lake.filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = planOf(pruned)
    val pf = """PartitionFilters: \[[^\]]*\]""".r.findFirstIn(plan)
    assert(pf.exists(_.contains("event_type")),
      s"partition predicate not pushed to PartitionFilters: $pf")
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"),
      "partition predicate leaked into data filters")
    // Layout is lossless.
    val before = graft.sources.Tables.events(spark, sfDir).count()
    assert(lake.count() == before)
    // Directory layout: one dir per event_type, nested date dirs.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_type=")), dirs.mkString(","))
  }

  test("vector_cosine participates in codegen (scoring stays in WSCG)") {
    graft.functions.VectorCosine.register(spark)
    val df = graft.sources.Tables
      .embeddings(spark, sfDir)
      .selectExpr("vector_cosine(embedding, embedding) AS c")
    val plan = planOf(df)
    assert(plan.contains("*("), "cosine projection fell out of whole-stage codegen")
  }

  test("q53 corpus prep: keeper filter is a broadcast semi join") {
    val plan = planOf(SparkEntry.queries("q53_corpus_prep")(spark, sfDir))
    assert(plan.contains("LeftSemi"), "keeper filter not planned as semi join")
    assert(plan.contains("BroadcastHashJoin"), "keeper set not broadcast")
  }

  test("q221 point-in-time SCD2 join: binned equi-join, no cartesian") {
    val plan = planOf(SparkEntry.queries("q221_pit_join")(spark, sfDir))
    // the interval lookup itself must be a HASH join keyed on the bin +
    // customer (one-row broadcast cross joins for the horizon scalar are
    // fine and expected)
    assert(plan.contains("BroadcastHashJoin [__bin") || plan.contains("SortMergeJoin [__bin"),
      "PIT interval lookup is not a bin-keyed hash join")
    assert(!plan.contains("CartesianProduct"), "PIT join planned a cartesian product")
  }

  test("q54 pure range join: binned equi-join, scan pruned to 3 columns, no nested loop") {
    val plan = planOf(SparkEntry.queries("q54_interval_join")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join fell back to a nested loop")
    assert(plan.contains("Join"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("l_orderkey"), "unpruned lineitem column in range-join scan")
  }

  test("q55 vocab: df is a partial+final aggregate and N joins as a broadcast") {
    val plan = planOf(SparkEntry.queries("q55_vocab")(spark, sfDir))
    assert(plan.toLowerCase.contains("partial_"), "df count-distinct not partially aggregated")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "corpus-size row should broadcast")
    assert(!plan.contains("SortAggregate"), "vocab agg should stay a hash aggregate")
  }

  test("q56 per-group top-k gets WindowGroupLimit (rank filter pushed into the window)") {
    // Catalyst's InferWindowGroupLimit turns row_number() <= k into a
    // per-group limit BEFORE the full window sort materializes — the
    // free-optimizer benefit of keeping top-k declarative.
    val plan = planOf(SparkEntry.queries("q56_tfidf_top")(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), "rank filter not pushed into the window")
  }

  test("q57 interval-overlap self-join is binned, never a nested loop") {
    val plan = planOf(SparkEntry.queries("q57_session_overlap")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), "overlap join fell back to a nested loop")
    assert(!plan.contains("CartesianProduct"), "overlap join planned as a cartesian product")
  }

  test("q30 brute-force ANN broadcasts the probe set against an un-shuffled corpus") {
    val plan = planOf(SparkEntry.queries("q30_ann_brute")(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin"), "probe set not broadcast")
    // The corpus must reach the scoring join without a shuffle: everything
    // below the join (printed after it) is scan-side, and the only
    // Exchange in the plan is the final per-query top-k window's, above.
    assert(!plan.split("BroadcastNestedLoopJoin").last.contains("Exchange hashpartitioning"),
      "corpus shuffled before scoring")
  }

  test("q123 IVF-PQ: candidate stage is a cell-keyed equi-join — no crossJoin anywhere") {
    val plan = planOf(SparkEntry.queries("q123_ann_ivfpq")(spark, sfDir))
    // the whole point vs pqTopK: the ADC scan is gated by probed cells,
    // so the plan must contain NO unpruned join shape
    assert(!plan.contains("BroadcastNestedLoopJoin"), "IVF-PQ fell back to a full-corpus scan")
    assert(!plan.contains("CartesianProduct"), "IVF-PQ planned a cartesian product")
    assert(plan.contains("cell"), "cell key missing from the candidate join")
  }

  test("q129 BM25: postings joins are hash joins; term filter gates the corpus relation") {
    val plan = planOf(SparkEntry.queries("q129_bm25")(spark, sfDir))
    // (the one-row corpus-constants broadcast legitimately plans as a
    // nested-loop fan — same shape as every scalar broadcast here; the
    // DATA joins must be keyed)
    assert(plan.contains("BroadcastHashJoin"), "df/doc-length joins not hash joins")
    assert(!plan.contains("CartesianProduct"))
    // the postings relation is gated by the 3-term IN filter before any join
    assert(plan.contains("data") && plan.contains("query") && plan.contains("stream"),
      "query-term filter missing from the physical plan")
  }

  test("q130 profile: N columns profiled in ONE scan of the table") {
    val plan = planOf(SparkEntry.queries("q130_profile")(spark, sfDir))
    // a per-column-job implementation would show one parquet scan per
    // column; the single-agg form scans customer exactly once
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 customer scan, saw $scans:\n$plan")
  }

  test("q106 fuzzy blocking joins on the banded key: hash join, no nested loop") {
    val plan = planOf(SparkEntry.queries("q106_fuzzy_match")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("__lb"), "length-band key missing from the join")
  }

  test("q67 stratified sample is a pure scan-side filter: one exchange (the final agg)") {
    val plan = planOf(SparkEntry.queries("q67_stratified_sample")(spark, sfDir))
    // the per-stratum rate CASE + hash filter must not introduce a join
    // or extra shuffle — rebalancing must stay a map-side operation
    assert(!plan.contains("Join"), "stratified rate lookup became a join")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected only the final agg shuffle, got $exchanges:\n$plan")
  }

  test("q74 k-bounded top-k aggregates partial+final — no Window, no full Sort") {
    val plan = planOf(SparkEntry.queries("q74_topk_group")(spark, sfDir))
    // the row_number formulation this replaces would show Window + a
    // per-partition Sort of the whole fact table
    assert(!plan.contains("Window"), "top-k fell back to a window function")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no typed aggregate in:\n$plan")
    assert(plan.toLowerCase.contains("partial_"),
      "no partial (map-side) aggregation — shuffle carries the full fact table")
  }

  test("q76 winnowing selects fingerprints scan-side: no shuffle below the explode") {
    val plan = planOf(
      graft.operators.Winnow.fingerprints(
        graft.sources.Tables.documents(spark, sfDir)))
    // fingerprint selection must be row-local: Generate (the explode)
    // sits directly on the scan with no Exchange or Window beneath it
    assert(plan.contains("Generate"), s"no explode in:\n$plan")
    assert(!plan.contains("Exchange"), "fingerprint selection shuffled")
    assert(!plan.contains("Window"), "fingerprint selection used a window sort")
  }

  test("q88 null-safe join broadcasts the dim (EqualNullSafe is a hash-join key)") {
    val plan = planOf(SparkEntry.queries("q88_nullsafe_join")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"null-safe join not hash/broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "null-safe join fell to nested loop")
  }

  test("q89 correlated scalar subqueries decorrelate into joins (no per-row re-execution)") {
    val plan = planOf(SparkEntry.queries("q89_scalar_subquery")(spark, sfDir))
    // decorrelation: correlated subqueries become aggregate+join; only the
    // uncorrelated max() may remain as a (run-once) scalar subquery node
    assert(plan.contains("Join") || plan.contains("HashJoin"), s"no join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "subquery executed as nested loop")
  }

  test("q94 chunk dedup: chunking is scan-side; exactly two exchanges (election, reassembly)") {
    val plan = planOf(
      graft.operators.Dedup.chunkDedup(graft.sources.Tables.documents(spark, sfDir)))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges in:\n$plan")
    assert(plan.contains("Generate"), "no scan-side explode")
  }

  test("q96 shard assign: one exchange (the per-shard position window)") {
    val plan = planOf(
      graft.operators.Sampling.shardAssign(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", 8, "s"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$plan")
  }

  test("q99 kmeans assignment is a pure scan-side projection (no shuffle, no UDF)") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    // probe the assignment shape via the public API with iters=0
    val plan = planOf(graft.operators.Similarity.kmeansAssign(emb, k = 4, iters = 0))
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), "UDF in hot path")
  }

  test("q137 CMS: hashes the distinct-key aggregate, probe join broadcasts") {
    val plan = planOf(
      graft.operators.CountMin.heavyHitters(
        graft.sources.Tables.lineitem(spark, sfDir), "l_partkey"))
    // the d-fold explode must sit ABOVE an aggregate (distinct keys),
    // not on the raw scan: Generate's child plan contains a HashAggregate
    val genIdx = plan.indexOf("Generate explode")
    assert(genIdx >= 0, "no explode in plan")
    assert(plan.indexOf("HashAggregate", genIdx) > 0,
      "explode not above the key aggregate — hashing raw events")
    assert(plan.contains("BroadcastHashJoin"), "probe join not broadcast")
  }

  test("q138 PMI pairs are generated scan-side: no position self-join") {
    val plan = planOf(
      graft.operators.Cooccur.pmiPairs(graft.sources.Tables.documents(spark, sfDir)))
    assert(!plan.contains("SortMergeJoin"), s"self-join in pair generation:\n$plan")
    assert(!plan.contains("CartesianProduct"), "cartesian pair generation")
    // (the single-row totals table broadcasts as a BNLJ cross — that is
    // the scalar fan-out, not pair generation)
    assert(plan.contains("Generate"), "no scan-side explode")
  }

  test("q139 Bloom probe is a broadcast semi-join on the set-bit table") {
    val cust = graft.sources.Tables.customer(spark, sfDir)
    val plan = planOf(
      graft.operators.Bloom.membershipSummary(
        cust.filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING"),
        graft.sources.Tables.orders(spark, sfDir)
          .select(org.apache.spark.sql.functions.col("o_custkey").as("c_custkey")),
        "c_custkey"))
    assert(plan.contains("LeftSemi"), "probe not a semi-join")
    assert(plan.contains("BroadcastHashJoin"), "bit table not broadcast")
  }

  test("q140 temperature sampling: rate table broadcasts back, corpus not re-shuffled for the join") {
    val plan = planOf(
      graft.operators.Sampling.temperatureSample(
        graft.sources.Tables.documents(spark, sfDir), "lang", "doc_id"))
    assert(plan.contains("BroadcastHashJoin"), "rate join not broadcast")
    assert(!plan.contains("SortMergeJoin"), "corpus shuffled for the rate join")
  }

  test("q142 triangles close with hash equi-joins — no nested loop anywhere") {
    val edges = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id AS src", "doc_id + 1 AS dst")
    val plan = planOf(graft.operators.Graph.triangleCounts(edges))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop triangle join:\n$plan")
    assert(plan.contains("Join") || plan.contains("HashJoin"), "no join in plan")
  }

  test("q145 repeated spans: single shingle scan, window repetition gate, no join") {
    val plan = planOf(
      graft.operators.Dedup.repeatedSpans(graft.sources.Tables.documents(spark, sfDir)))
    assert(plan.contains("Generate"), "no scan-side shingle explode")
    // The repetition gate is min!=max over a sig window — the shingle
    // explode must appear exactly once (the groupBy+semi-join shape
    // scanned and hashed it twice, 4.8x slower at sf0.1).
    assert(plan.split("Generate explode").length == 2,
      s"shingle explode evaluated more than once:\n$plan")
    assert(!plan.contains("Join"), s"join in span detection (should be window-gated):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "nested loop in span detection")
  }

  test("q148 weighted sample plans as TakeOrderedAndProject (partial top-n, no global sort)") {
    val plan = planOf(
      graft.operators.Sampling.weightedSample(
        graft.sources.Tables.orders(spark, sfDir), "o_orderkey", "o_totalprice", 200))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in weighted sample:\n$plan")
  }

  test("q150 mad outliers: every join broadcast (group-stat sized), no shuffle join") {
    val plan = planOf(
      graft.operators.Drift.madOutliers(
        graft.sources.Tables.events(spark, sfDir), "event_type", "value"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"shuffle join on group stats:\n$plan")
  }

  test("q146 exact sample plans as TakeOrderedAndProject (partial top-n, no global sort)") {
    val plan = planOf(
      graft.operators.Sampling.exactSample(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", 100))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in sample:\n$plan")
  }

  // ---- round-8 operators ----------------------------------------------

  test("q287 fifo match: keyed hash join on the cumulative intervals, no nested loop") {
    val plan = planOf(SparkEntry.queries("q287_fifo_match")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap fell back to a nested loop:\n$plan")
  }

  test("q295 reuse distance: point-in-interval attaches via hash join, no cartesian") {
    val plan = planOf(SparkEntry.queries("q295_reuse_distance")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), s"cartesian in reuse distance:\n$plan")
    // the gap↔position attach must be the binned equi-join, not a range
    // nested loop; the only nested-loop is the deliberate one-row totals fan
    assert(plan.contains("hashpartitioning(__bin") || plan.contains("__bin"),
      s"binned equi-join missing from plan:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }

  test("q274 naive bayes: likelihood/prior model tables broadcast into scoring") {
    val plan = planOf(SparkEntry.queries("q274_naive_bayes")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"model join not broadcast:\n$plan")
  }

  test("hilbert_index is a compiled expression, not a Column unroll") {
    import org.apache.spark.sql.functions._
    val df = spark.range(4)
      .select(graft.sources.LakeWriter.hilbertValue(col("id"), col("id") + 1, 8).as("h"))
    // one expression node in the projection — the plan string stays tiny
    // (a per-level Column unroll at bits=8 would be thousands of nodes;
    // with literal inputs the optimizer even constant-folds it away)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("hilbert_index"), plan)
    assert(plan.length < 2000, s"hilbert expression unexpectedly large: ${plan.length} chars")
  }

  test("q272 dp counts: noise projection is row-local on the aggregated cells") {
    val plan = planOf(SparkEntry.queries("q272_dp_counts")(spark, sfDir))
    // exactly one exchange: the keyed count; noise adds no shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"unexpected extra shuffles in DP release:\n$plan")
  }

  test("q312 matching: the nearest-control window is partitioned by block, not global") {
    val plan = planOf(SparkEntry.queries("q312_matching")(spark, sfDir))
    assert(plan.contains("hashpartitioning(block"),
      s"matching window not partitioned by the block key:\n$plan")
    // the only single-partition stage is the one-row final summary
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles <= 1, s"extra global exchanges in matching plan:\n$plan")
  }

  test("q315 encoding advisor: run-count window is partitioned by (col_name, layout key)") {
    val plan = planOf(SparkEntry.queries("q315_encoding_advisor")(spark, sfDir))
    assert(plan.contains("hashpartitioning(col_name"),
      s"advisor window not partition-parallel:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"advisor plan has a global single-partition stage:\n$plan")
  }

  test("q295 reuse-distance position index: keyed bucket window, no trace-sized single partition") {
    val df = graft.operators.ReuseDistance.positionIndex(
      graft.sources.Tables.events(spark, sfDir), "user_id", 1)
    val plan = planOf(df)
    // the big-relation rank window is partitioned by the time bucket
    assert(plan.contains("hashpartitioning(bucket"),
      s"position-index window not partitioned by bucket:\n$plan")
    // the only single-partition exchange feeds the ~1024-row
    // bucket-count offset relation, never the trace itself
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles <= 1, s"extra global exchanges in position index:\n$plan")
  }

  test("q380-q383 decorrelation suite: correlated subqueries become keyed joins, no per-row re-execution") {
    // q380 correlated scalar-min, q382 correlated group-threshold IN:
    // both must land as aggregates joined on the correlation key
    for (q <- Seq("q380_min_cost_supplier", "q382_dominant_supplier")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q kept a nested-loop shape:\n$plan")
    }
    // q383's EXISTS / NOT EXISTS pair compiles to semi + anti hash joins
    val p383 = planOf(SparkEntry.queries("q383_lone_late_supplier")(spark, sfDir))
    assert(p383.contains("LeftSemi"), s"q383 EXISTS not a semi join:\n$p383")
    assert(p383.contains("LeftAnti"), s"q383 NOT EXISTS not an anti join:\n$p383")
    assert(!p383.contains("CartesianProduct"), s"q383 planned a cartesian:\n$p383")
  }

  test("q391 DSIR: bucket-weight relation joins broadcast; score is aggregated, not windowed") {
    val plan = planOf(SparkEntry.queries("q391_dsir_importance")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"256-row bucket weights not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"DSIR score planned a window:\n$plan")
    // top-200 must be a TakeOrdered, never a global sort of all docs
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
  }

  test("q390 mutual-NN top-1 is partial-aggregated (no pair-sized window sort)") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val plan = planOf(graft.operators.Similarity.bruteTop1(emb, emb))
    assert(!plan.contains("Window"), s"bruteTop1 planned a window:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"bruteTop1 not a partial aggregate:\n$plan")
  }

  test("q390 registered path (ivfTop1) never cross-joins or window-sorts the pair space") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val plan = planOf(graft.operators.Similarity.ivfTop1(emb, emb))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ivfTop1 planned an unkeyed join:\n$plan")
    assert(!plan.contains("Window"), s"ivfTop1 planned a window:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"ivfTop1 top-1 not a partial aggregate:\n$plan")
    // the probe/inverted-list meet must be the keyed equi-join on cell —
    // a forced broadcast of a corpus-sized probe set is the r7 scale bug
    // (AQE may still pick BHJ at this SF from size stats; what must not
    // appear is a broadcast HINT on the probe side — ResolvedHint in the
    // analyzed plan)
    val logical = graft.operators.Similarity.ivfTop1(emb, emb)
      .queryExecution.analyzed.toString
    assert(!logical.contains("ResolvedHint"),
      s"ivfTop1 forces a broadcast hint on a corpus-sized side:\n$logical")
  }

  test("q308 sssp: every relaxation round is a hash join + keyed min, no nested loop") {
    val plan = planOf(SparkEntry.queries("q308_sssp")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"sssp relaxation planned a nested loop:\n$plan")
  }

  test("q406 repeated substrings: anchor join is a hash equi-join on the gram key, no cartesian") {
    val plan = planOf(SparkEntry.queries("q406_repeated_substring")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), s"q406 planned a cartesian:\n$plan")
    assert(plan.toLowerCase.contains("partial_"), s"q406 gram agg not partial:\n$plan")
    // anchor islands ride per-doc windows, never a corpus-global one
    assert(!plan.contains("Exchange SinglePartition"),
      s"q406 has a global single-partition stage:\n$plan")
  }

  test("q416 segment dedup: hash-keyed first-occurrence window, no global stage, no cartesian") {
    val plan = planOf(SparkEntry.queries("q416_segment_dedup")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), s"q416 planned a cartesian:\n$plan")
    assert(plan.contains("hashpartitioning(h"),
      s"q416 first-occurrence window not partitioned by segment hash:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q416 has a global single-partition stage:\n$plan")
  }

  test("q421 novelty curve: gram aggs are partial; only the nmax scalar is a global stage") {
    val plan = planOf(SparkEntry.queries("q421_novelty_curve")(spark, sfDir))
    assert(plan.toLowerCase.contains("partial_"), s"q421 gram agg not partial:\n$plan")
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles <= 1, s"q421 has corpus-sized global stages:\n$plan")
  }

  test("q423 vocab duel: top-256 plans as TakeOrdered; rank window only over the 256-row vocab") {
    val plan = planOf(SparkEntry.queries("q423_vocab_duel")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"q423 vocab selection not a distributed top-k:\n$plan")
    // the only single-partition stage is the 256-row rank window
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles <= 1, s"q423 has extra global stages:\n$plan")
  }

  test("q426 source overlap: gram self-join is a hash equi-join, no cartesian") {
    val plan = planOf(SparkEntry.queries("q426_source_overlap")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), s"q426 planned a cartesian:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q426 has a global single-partition stage:\n$plan")
  }

  test("q431 k-center: joins stay equi; the selection relation is bounded") {
    // r9 rewrite: the per-round farthest-point top-1s (each a distributed
    // TakeOrderedAndProject) execute during CONSTRUCTION via the
    // checkpointed compact projection; the final plan is just the 4-row
    // selected relation equi-joined to labels — assert it carries no
    // nested-loop/cartesian and broadcasts the bounded selection side.
    val plan = planOf(SparkEntry.queries("q431_kcenter_coreset")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), s"q431 planned a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q431 planned a nested loop:\n$plan")
    assert(plan.contains("LocalTableScan"),
      s"q431 selection side should be the driver-built bounded relation:\n$plan")
  }

  test("q417/q418 centroid scoring: dim joins are equi-joins, bands per-label, no cartesian") {
    for (q <- Seq("q417_prototypicality", "q418_label_noise")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q planned a cartesian:\n$plan")
      assert(!plan.contains("Exchange SinglePartition"),
        s"$q has a global single-partition stage:\n$plan")
    }
  }
}
