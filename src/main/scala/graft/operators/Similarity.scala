package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorCosine

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the build rules:
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *     against the full corpus; one scan, no shuffle of the corpus, a
  *     partial top-k per partition then final top-k (window over the
  *     candidate set). The correctness baseline.
  *   - [[lshTopK]]: SRP-LSH bucketed search — corpus and queries hashed to
  *     sign-bit buckets; only same-bucket candidates are scored. At 100 TB
  *     the bucket join replaces the full scan per query with a hash lookup;
  *     recall is tunable via tables × planes.
  *
  * Scoring uses [[VectorCosine]] — one compiled pass per pair,
  * bit-identical to the `zip_with`/`aggregate` double fold (and so to the
  * DuckDB oracle), minus the interpreted-lambda overhead.
  */
object Similarity {

  private def cosCol(a: String, b: String): Column = {
    // Registered once per session; name is stable.
    expr(s"vector_cosine($a, $b)")
  }

  /** Contractual probe-panel cap for the topK family. The query side of
    * every topK variant is a bounded panel (the corpus-scale query side
    * belongs to the Top1 variants, which join hint-free); this cap is
    * what makes that contract MACHINE-CHECKABLE — each method wraps its
    * probe relation in an explicit LIMIT, so
    * [[graft.plans.PlanGuard.isBoundedLogical]] proves the broadcast-
    * hinted side row-bounded from the plan alone instead of trusting the
    * call site. Semantically a no-op for every in-contract caller
    * (panels are ≤ this by construction); a panel that exceeds it is
    * out of contract for a broadcast-probe plan in the first place.
    */
  val MaxProbePanel: Int = 1000

  private def boundedProbes(queries: DataFrame): DataFrame =
    queries.limit(MaxProbePanel)

  /** Exact top-k neighbors for each query vector (query set must be small
    * enough to broadcast — it is the `LIMIT`ed probe set, not the corpus).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    VectorCosine.register(corpus.sparkSession)
    val q = boundedProbes(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val scored = corpus
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** k = 1 specialization of [[bruteTopK]] with the identical
    * (cosine DESC, neighbor_id ASC) tie-break, as a PARTIAL-AGGREGATED
    * max-struct instead of a window: the |queries|×|corpus| scored
    * relation combines map-side down to one row per query, so no
    * pair-sized sort or shuffle ever runs — the plan that survives a
    * corpus-scale ALL-vectors query set (mutual-NN's shape), where the
    * window variant would sort the full pair space.
    */
  def bruteTop1(corpus: DataFrame, queries: DataFrame): DataFrame = {
    VectorCosine.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    corpus
      // Hint-free: the query side is corpus-scale by contract (mutual-NN's
      // shape), so a forced broadcast would ship the whole corpus to every
      // executor; AQE picks the build side from actual runtime sizes.
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine"))
      // lexicographic struct max = (highest cosine, then smallest id)
      .groupBy(col("query_id"))
      .agg(max(struct(col("cosine"), (-col("neighbor_id")).as("negid"))).as("m"))
      .select(
        col("query_id"),
        (-col("m.negid")).as("neighbor_id"),
        col("m.cosine").as("cosine"))
  }

  /** LSH-bucketed ANN: score only corpus vectors landing in the same
    * signature bucket as the query in at least one table. Returns up to k
    * neighbors per query (possibly fewer — recall/latency trade-off).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      dim: Int = 64,
      tables: Int = 8,
      planesPerTable: Int = 6,
      seed: Long = 7L
  ): DataFrame = {
    val spark = corpus.sparkSession
    val fn = s"srp_ann_${tables}_${planesPerTable}_$seed"
    graft.functions.SrpSignatures.register(spark, fn, dim, tables, planesPerTable, seed)
    lshTopKImpl(corpus, queries, k, fn, tables)
  }

  /** ORACLE-REPLAYABLE LSH ANN: identical bucket join + exact-cosine
    * rerank as [[lshTopK]], over the md5-derived hyperplane family
    * ([[graft.functions.SrpSignatures.makePlanesMd5]]) — every plane
    * component is an exact 48-bit rational a SQL engine recomputes from
    * the plane-name strings, so the CANDIDATE SET (not just the final
    * ranking function) replays cross-engine. Seeded-Gaussian [[lshTopK]]
    * stays the production default.
    */
  def lshTopKMd5(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      dim: Int = 64,
      tables: Int = 8,
      planesPerTable: Int = 6
  ): DataFrame = {
    val spark = corpus.sparkSession
    val fn = s"srp_ann_md5_${tables}_$planesPerTable"
    graft.functions.SrpSignatures.registerMd5(spark, fn, dim, tables, planesPerTable)
    lshTopKImpl(corpus, queries, k, fn, tables)
  }

  /** MULTI-PROBE SRP-LSH ANN ([[graft.functions.SrpMultiProbe]], Lv et
    * al. 2007): the corpus indexes ONCE per table (base signatures, the
    * [[lshTopKMd5]] index), while each query probes its base bucket
    * PLUS `nprobe − 1` single-bit perturbations of the least-confident
    * planes. Same recall lever as adding tables, without adding
    * corpus-sized index columns — at 100 TB extra probes are extra
    * lookups, extra tables are extra indexes. md5 plane family, so the
    * probe SEQUENCE (not just the ranking) replays in the oracle.
    */
  def multiProbeTopKMd5(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      dim: Int = 64,
      tables: Int = 4,
      planesPerTable: Int = 6,
      nprobe: Int = 3
  ): DataFrame = {
    val spark = corpus.sparkSession
    VectorCosine.register(spark)
    val sigFn = s"srp_mp_base_${tables}_$planesPerTable"
    val probeFn = s"srp_mp_probe_${tables}_${planesPerTable}_$nprobe"
    graft.functions.SrpSignatures.registerMd5(spark, sigFn, dim, tables, planesPerTable)
    graft.functions.SrpMultiProbe
      .registerMd5(spark, probeFn, dim, tables, planesPerTable, nprobe)
    val c = corpus.select(
      col("vec_id").as("neighbor_id"),
      col("embedding"),
      posexplode(expr(s"$sigFn(embedding)")).as(Seq("table_id", "sig")))
    // The post-explode LIMIT re-establishes the machine-checkable row
    // bound (a Generate voids the panel's bound for the plan gate); it is
    // exactly panel x tables x nprobe rows, a no-op for the bounded panel.
    val q = boundedProbes(queries)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("q_vec"),
        posexplode(expr(s"$probeFn(embedding)")).as(Seq("pos", "q_sig")))
      .withColumn("q_table_id", expr(s"pos div $nprobe"))
      .limit(MaxProbePanel * tables * nprobe)
    val candidates = c
      .join(
        broadcast(q),
        col("table_id") === col("q_table_id") && col("sig") === col("q_sig") &&
          col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("q_vec"), col("neighbor_id"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * shingle-based `Dedup.decontaminate`: corpus vectors whose cosine to
    * ANY eval-set vector reaches `threshold` are contamination hits.
    * Candidate generation is the md5-SRP bucket join (cross-set, eval
    * side broadcast — it is benchmark-sized by definition), exact cosine
    * only on candidates; per corpus doc the WORST hit survives (max
    * cosine, eval_id tie-break). At 100 TB: corpus-side work is one
    * signature scan + a bucket-keyed lookup, never a cross join.
    *
    * Output: (doc_id, eval_id, cosine) — one row per contaminated doc.
    */
  def semanticContamination(
      corpus: DataFrame,
      evalSet: DataFrame,
      threshold: Double = 0.30,
      dim: Int = 64,
      tables: Int = 6,
      planesPerTable: Int = 4
  ): DataFrame = {
    val spark = corpus.sparkSession
    val fn = s"srp_decontam_md5_${tables}_$planesPerTable"
    graft.functions.SrpSignatures.registerMd5(spark, fn, dim, tables, planesPerTable)
    VectorCosine.register(spark)
    val c = corpus.select(
      col("vec_id").as("doc_id"),
      col("embedding").as("c_vec"),
      posexplode(expr(s"$fn(embedding)")).as(Seq("table_id", "sig")))
    val e = evalSet.select(
      col("vec_id").as("eval_id"),
      col("embedding").as("e_vec"),
      posexplode(expr(s"$fn(embedding)")).as(Seq("e_table_id", "e_sig")))
    val scored = c
      .join(
        broadcast(e),
        col("table_id") === col("e_table_id") && col("sig") === col("e_sig"))
      .dropDuplicates("doc_id", "eval_id")
      .select(
        col("doc_id"),
        col("eval_id"),
        round(cosCol("c_vec", "e_vec"), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
    val worst = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("cosine").desc, col("eval_id").asc)
    scored
      .withColumn("rn", row_number().over(worst))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  private def lshTopKImpl(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      fn: String,
      tables: Int
  ): DataFrame = {
    VectorCosine.register(corpus.sparkSession)
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(
          col("vec_id").as(idAs),
          col("embedding").as(vecAs),
          posexplode(expr(s"$fn(embedding)")).as(Seq("table_id", "sig"))
        )
    val c = banded(corpus, "neighbor_id", "embedding")
    // Post-explode LIMIT: re-establishes the machine-checkable bound the
    // posexplode voids (exactly panel x tables rows; no-op in contract).
    val q = banded(boundedProbes(queries), "query_id", "q_vec")
      .withColumnRenamed("table_id", "q_table_id")
      .withColumnRenamed("sig", "q_sig")
      .limit(MaxProbePanel * tables)
    // One bucket join on (table, signature); the probe set broadcasts.
    val candidates = c
      .join(
        broadcast(q),
        col("table_id") === col("q_table_id") && col("sig") === col("q_sig") &&
          col("neighbor_id") =!= col("query_id")
      )
      .select(col("query_id"), col("q_vec"), col("neighbor_id"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a tiny driver-side coarse quantizer (k-means
    * over a bounded deterministic training sample) assigns every corpus
    * vector to exactly ONE cell row-locally
    * ([[graft.functions.NearestCentroids]], nprobe=1 — no join, no
    * shuffle); queries probe their `nprobe` nearest cells and score only
    * those cells' members exactly.
    *
    * Scale shape: the quantizer is k×dim doubles shipped inside the plan;
    * the inverted lists are just a `cell` column on the corpus — at 100 TB
    * you'd write the corpus partitioned/bucketed by `cell` so a probe
    * reads only its cells' files (partition pruning), and train the
    * quantizer on a `TABLESAMPLE` instead of a head sample. Probed cells
    * are disjoint (one cell per corpus vector), so no candidate dedupe is
    * needed — unlike multi-table LSH.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      numCells: Int = 16,
      nprobe: Int = 4,
      dim: Int = 64,
      lloydIters: Int = 2,
      trainLimit: Int = 2000
  ): DataFrame = {
    val (indexed, probes0) =
      ivfIndex(corpus, boundedProbes(queries), numCells, nprobe, dim, lloydIters, trainLimit)
    // Post-explode LIMIT (panel x nprobe rows, a no-op in contract): makes
    // the broadcast-hinted probe side machine-checkably bounded.
    val probes = probes0.limit(MaxProbePanel * nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    indexed
      .join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF top-1 for a CORPUS-SCALE query set (every vector queries, as in
    * mutual-NN): the same deterministic coarse quantizer as [[ivfTopK]],
    * but the probe side is NOT broadcast — with |queries| ≈ |corpus| a
    * broadcast ships the whole corpus to every executor and dies at
    * scale (the r7 q390 finding). Instead probes and inverted lists meet
    * in a keyed equi-join on `cell` (each side shuffles once, by cell),
    * and top-1 reduces as a map-side-combined max-struct — no pair-sized
    * window sort ever runs. Exactness is per-candidate-set: the emitted
    * cosine is exact; only candidate CHOICE is approximate (standard IVF
    * recall/latency trade).
    */
  def ivfTop1(
      corpus: DataFrame,
      queries: DataFrame,
      numCells: Int = 16,
      nprobe: Int = 4,
      dim: Int = 64,
      lloydIters: Int = 2,
      trainLimit: Int = 2000
  ): DataFrame = {
    val (indexed, probes) =
      ivfIndex(corpus, queries, numCells, nprobe, dim, lloydIters, trainLimit)
    indexed
      .join(probes, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine"))
      // lexicographic struct max = (highest cosine, then smallest id),
      // combining map-side — the bruteTop1 reduction over IVF candidates
      .groupBy(col("query_id"))
      .agg(max(struct(col("cosine"), (-col("neighbor_id")).as("negid"))).as("m"))
      .select(
        col("query_id"),
        (-col("m.negid")).as("neighbor_id"),
        col("m.cosine").as("cosine"))
  }

  /** The IVF cell ASSIGNMENT alone (vec_id, cell) — the deterministic
    * coarse-quantizer partition of the corpus, reused as a clustering
    * by the agreement audits (q474). Same build as [[ivfTopK]].
    */
  def ivfAssign(
      corpus: DataFrame,
      numCells: Int = 16,
      dim: Int = 64,
      lloydIters: Int = 2,
      trainLimit: Int = 2000
  ): DataFrame = {
    val (indexed, _) =
      ivfIndex(corpus, corpus.limit(0), numCells, nprobe = 1, dim, lloydIters, trainLimit)
    indexed.select(col("neighbor_id").as("vec_id"), col("cell"))
  }

  /** Shared IVF index build: deterministic coarse quantizer (lowest-id
    * seed sample, grid-quantized Lloyd) shipped inside the plan; returns
    * the cell-keyed corpus (`neighbor_id`, `embedding`, `cell`) and the
    * nprobe-exploded query probes (`query_id`, `q_vec`, `cell`).
    */
  private def ivfIndex(
      corpus: DataFrame,
      queries: DataFrame,
      numCells: Int,
      nprobe: Int,
      dim: Int,
      lloydIters: Int,
      trainLimit: Int
  ): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    VectorCosine.register(spark)
    val sample: Array[Array[Float]] = corpus
      .orderBy(col("vec_id"))
      .limit(trainLimit)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val centroids = trainKMeans(sample, numCells, dim, lloydIters)
    val assignFn = s"ivf_cell_${numCells}_$dim"
    val probeFn = s"ivf_probe_${numCells}_${nprobe}_$dim"
    graft.functions.NearestCentroids.register(spark, assignFn, centroids, numCells, dim, 1)
    graft.functions.NearestCentroids.register(spark, probeFn, centroids, numCells, dim, nprobe)
    val indexed = corpus.select(
      col("vec_id").as("neighbor_id"),
      col("embedding"),
      element_at(expr(s"$assignFn(embedding)"), 1).as("cell")
    )
    val probes = queries.select(
      col("vec_id").as("query_id"),
      col("embedding").as("q_vec"),
      explode(expr(s"$probeFn(embedding)")).as("cell")
    )
    (indexed, probes)
  }

  /** Product-quantization ANN ([[graft.functions.PqKernels]]) — the third
    * scale path next to LSH buckets and IVF cells, for when the corpus's
    * EMBEDDINGS no longer fit the cluster: vectors are encoded once into
    * `m` small codes (the persisted index column at 100 TB — 8 ints
    * instead of 64 floats per vector), each query precomputes an m×ksub
    * lookup table, and the candidate scan scores a vector in m ADDS
    * (asymmetric distance computation). The top `rerank` candidates per
    * query are then re-scored EXACTLY against their true embeddings —
    * standard two-stage PQ retrieval, so the emitted `cosine` values are
    * exact and only the candidate choice is approximate.
    *
    * Codebooks are trained driver-side per subspace (deterministic seeded
    * Lloyd on a bounded sample, like [[ivfTopK]]'s coarse quantizer) and
    * ship inside the plan.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      m: Int = 8,
      ksub: Int = 16,
      dim: Int = 64,
      rerank: Int = 32,
      lloydIters: Int = 3,
      trainLimit: Int = 2000
  ): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val spark = corpus.sparkSession
    VectorCosine.register(spark)
    val sample: Array[Array[Float]] = corpus
      .orderBy(col("vec_id"))
      .limit(trainLimit)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val codebooks = trainPqCodebooks(sample, m, ksub, dim, lloydIters)
    val fn = s"pq_${m}_${ksub}_$dim"
    graft.functions.PqKernels.register(spark, fn, codebooks, m, ksub, dim)

    // Index scan: codes only (this is the column a deployment persists).
    val coded = corpus.select(
      col("vec_id").as("neighbor_id"),
      expr(s"${fn}_encode(embedding)").as("codes"))
    val probes = boundedProbes(queries).select(
      col("vec_id").as("query_id"),
      col("embedding").as("q_vec"),
      expr(s"${fn}_lut(embedding)").as("lut"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)
    val candidates = coded
      .crossJoin(broadcast(probes.select(col("query_id"), col("lut"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        expr(s"${fn}_adc(codes, lut)").as("adc"))
      .withColumn("adc_rank", row_number().over(w))
      .filter(col("adc_rank") <= rerank)
      .select("query_id", "neighbor_id")
      // panel x rerank rows by the rank filter; the LIMIT states the bound
      // in a form the plan gate can prove (no-op in contract)
      .limit(MaxProbePanel * rerank)

    // Exact rerank of the small candidate set: fetch the true embeddings
    // with one broadcast semi-shaped join, score exactly, final top-k.
    val wx = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(candidates), "neighbor_id")
      .join(broadcast(probes.select(col("query_id"), col("q_vec"))), "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine"))
      .withColumn("rank", row_number().over(wx))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ: the scale-safe composition of the two index structures —
    * [[ivfTopK]]'s coarse quantizer prunes the CANDIDATE SET (each query
    * scores only its `nprobe` cells' members) and [[pqTopK]]'s codes
    * compress the SCORING (m ADC adds per candidate instead of a
    * dim-float dot product). This replaces pqTopK's full-corpus ADC scan
    * — O(corpus × queries) with no pruning, fine for a compressed-index
    * demo but a per-query-batch full scan at 100 TB — with a cell-keyed
    * EQUI-join: at scale the corpus is written partitioned by `cell`, so
    * a probe reads only nprobe/numCells of the data (partition pruning)
    * and scores it at PQ speed. Standard FAISS IVFPQ layout with
    * by_residual=false (codes quantize raw vectors, not residuals),
    * which keeps one codebook shared across cells.
    *
    * Stage 2 reranks the top `rerank` ADC candidates per query against
    * their true embeddings, so emitted `cosine` values are exact and
    * only candidate CHOICE is approximate — same contract as [[pqTopK]]
    * and [[ivfTopK]].
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      numCells: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      dim: Int = 64,
      rerank: Int = 32,
      lloydIters: Int = 2,
      trainLimit: Int = 2000
  ): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val spark = corpus.sparkSession
    VectorCosine.register(spark)
    val sample: Array[Array[Float]] = corpus
      .orderBy(col("vec_id"))
      .limit(trainLimit)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val centroids = trainKMeans(sample, numCells, dim, lloydIters)
    val codebooks = trainPqCodebooks(sample, m, ksub, dim, lloydIters)
    val assignFn = s"ivf_cell_${numCells}_$dim"
    val probeFn = s"ivf_probe_${numCells}_${nprobe}_$dim"
    val pqFn = s"pq_${m}_${ksub}_$dim"
    graft.functions.NearestCentroids.register(spark, assignFn, centroids, numCells, dim, 1)
    graft.functions.NearestCentroids.register(spark, probeFn, centroids, numCells, dim, nprobe)
    graft.functions.PqKernels.register(spark, pqFn, codebooks, m, ksub, dim)

    // Persisted-index shape: (cell, codes) — the scan a deployment runs.
    val coded = corpus.select(
      col("vec_id").as("neighbor_id"),
      element_at(expr(s"$assignFn(embedding)"), 1).as("cell"),
      expr(s"${pqFn}_encode(embedding)").as("codes"))
    // One probe row per (query, probed cell): the LUT rides along so the
    // ADC scan needs no second join. Post-explode LIMIT (panel x nprobe
    // rows, no-op in contract) keeps the hinted side provably bounded.
    val probes = boundedProbes(queries).select(
      col("vec_id").as("query_id"),
      expr(s"${pqFn}_lut(embedding)").as("lut"),
      explode(expr(s"$probeFn(embedding)")).as("cell"))
      .limit(MaxProbePanel * nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)
    // Cell-keyed equi-join — probed cells are disjoint per query (one
    // cell per probe row), so a (query, neighbor) pair meets at most
    // once and needs no dedupe before ranking.
    val candidates = coded
      .join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        expr(s"${pqFn}_adc(codes, lut)").as("adc"))
      .withColumn("adc_rank", row_number().over(w))
      .filter(col("adc_rank") <= rerank)
      .select("query_id", "neighbor_id")
      // panel x rerank rows by the rank filter, stated as a provable LIMIT
      .limit(MaxProbePanel * rerank)

    val wx = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(candidates), "neighbor_id")
      .join(
        broadcast(boundedProbes(queries)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))),
        "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosCol("q_vec", "embedding"), 6).as("cosine"))
      .withColumn("rank", row_number().over(wx))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training — the training-pair
    * construction stage of a retrieval/embedding pipeline: for each
    * anchor, the top-1 exact-cosine neighbor is the positive and the
    * next `negK` are the hard negatives (high-similarity non-positives,
    * the pairs that actually move a contrastive loss). Built on
    * [[bruteTopK]]'s ranking, so candidate choice, scores, and
    * tie-breaks inherit its exactness; the emitted margin is
    * pos − neg per pair.
    *
    * At 100 TB the anchor set is a batch (broadcastable) and the top-k
    * source swaps to [[ivfPqTopK]] — the output contract is unchanged.
    */
  def contrastivePairs(corpus: DataFrame, queries: DataFrame, negK: Int = 3): DataFrame = {
    val topk = bruteTopK(corpus, queries, k = negK + 1)
    val pos = topk
      .filter(col("rank") === 1)
      .select(
        col("query_id").as("anchor_id"),
        col("neighbor_id").as("pos_id"),
        col("cosine").as("pos_cos"))
    val negs = topk
      .filter(col("rank") > 1)
      .select(
        col("query_id").as("anchor_id"),
        col("neighbor_id").as("neg_id"),
        col("cosine").as("neg_cos"))
    pos
      .join(negs, "anchor_id")
      .select(
        col("anchor_id"),
        col("pos_id"),
        col("neg_id"),
        col("pos_cos"),
        col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
  }

  /** Symmetric INT8 quantization of the embedding column — the storage
    * path for a vector corpus at scale (4× smaller than float32, and
    * the form int8-SIMD scorers consume): per-vector scale =
    * max|x|/127, code = floor(x/scale + 0.5) — the explicit round-half-
    * up form, identical on every engine, where a bare `round()` would
    * hit tie-convention differences. Returns (vec_id, scale, codes,
    * plus per-vector round-trip error stats); all arithmetic is
    * row-local HOFs over the 64-dim array — quantizing 100 TB of
    * embeddings is a pure scan.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = transform(col("embedding"), _.cast("double"))
    emb
      .select(col("vec_id"), v.as("__v"))
      .withColumn("__mx", array_max(transform(col("__v"), x => abs(x))))
      .withColumn(
        "scale",
        when(col("__mx") === 0.0, lit(1.0)).otherwise(col("__mx") / 127.0))
      .withColumn(
        "codes",
        transform(col("__v"), x => floor(x / col("scale") + lit(0.5)).cast("int")))
      .withColumn(
        "__errs",
        zip_with(col("__v"), col("codes"), (x, c) => abs(c * col("scale") - x)))
      .select(
        col("vec_id"),
        col("scale"),
        col("codes"),
        col("__errs"))
  }

  /** Per-subspace L2 Lloyd iterations on the bounded sample: deterministic
    * striped init (sample rows 0, stride, 2·stride, … per subspace), empty
    * cells keep their previous centroid. Returns [m][ksub][dsub] flattened.
    */
  private def trainPqCodebooks(
      sample: Array[Array[Float]],
      m: Int,
      ksub: Int,
      dim: Int,
      iters: Int
  ): Array[Double] = {
    require(sample.nonEmpty, "empty training sample")
    val dsub = dim / m
    val books = new Array[Double](m * ksub * dsub)
    val stride = math.max(1, sample.length / ksub)
    for (s <- 0 until m; c <- 0 until ksub; i <- 0 until dsub) {
      val v = sample((c * stride) % sample.length)
      val x = s * dsub + i
      books((s * ksub + c) * dsub + i) = if (x < v.length) v(x).toDouble else 0.0
    }
    for (_ <- 0 until iters; s <- 0 until m) {
      val sums = new Array[Double](ksub * dsub)
      val counts = new Array[Int](ksub)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < ksub) {
          var d2 = 0.0
          var i = 0
          while (i < dsub) {
            val x = s * dsub + i
            val vi = if (x < v.length) v(x).toDouble else 0.0
            val diff = vi - books((s * ksub + c) * dsub + i)
            d2 += diff * diff
            i += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        var i = 0
        while (i < dsub) {
          val x = s * dsub + i
          sums(best * dsub + i) += (if (x < v.length) v(x).toDouble else 0.0)
          i += 1
        }
        counts(best) += 1
      }
      // Same 2^-20 grid snap as trainKMeans: severs the reduction-order
      // dependence of the per-cell sums so a relational replay (GROUP BY
      // in any order) rebuilds bit-identical codebooks.
      for (c <- 0 until ksub if counts(c) > 0; i <- 0 until dsub)
        books((s * ksub + c) * dsub + i) =
          math.floor(sums(c * dsub + i) / counts(c) * 1048576.0) / 1048576.0
    }
    books
  }

  /** DISTRIBUTED Lloyd's k-means over the embedding column — the
    * clustering pass behind semantic dedup (SemDeDup-style: cluster,
    * then compare only within a cluster) and IVF-like partitioning, run
    * as DataFrame jobs so the corpus never leaves the executors:
    *
    *   - assignment is a pure scan-side projection (k ordered-fold
    *     distance expressions over the vector, argmin with
    *     lowest-centroid tie-break) — no shuffle, no UDF;
    *   - the update step is one explode + (cluster, dim) hash aggregate
    *     (64·k cells), collected to the driver (k×dim doubles — tiny at
    *     any corpus scale);
    *   - centroids are QUANTIZED to the binary grid floor(x·2²⁰)/2²⁰
    *     between iterations: power-of-two scaling is exact in IEEE
    *     doubles, so any engine (the DuckDB oracle replays the identical
    *     iterations relationally) lands on bit-identical centroids and
    *     assignments don't wobble on last-ulp arithmetic differences.
    *
    * Init is deterministic: the k lowest-id vectors. An emptied cluster
    * keeps its previous centroid. Output: (vec_id, v, cluster, dist2) —
    * the double-cast vector rides along so compositions (e.g.
    * [[semanticNearDupPairs]]) don't re-join the embedding table.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 4, iters: Int = 2): DataFrame = {
    require(k > 0 && iters >= 0, "need k > 0, iters >= 0")
    val pts = emb.select(
      col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    def quant(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0

    def assign(centroids: Array[Array[Double]]): DataFrame = {
      val dists = centroids.map { c =>
        val carr = array(c.map(lit): _*)
        aggregate(
          zip_with(col("v"), carr, (a, b) => (a - b) * (a - b)),
          lit(0.0),
          (acc, x) => acc + x)
      }
      val best = dists.zipWithIndex.tail.foldLeft((lit(0L), dists(0))) {
        case ((bi, bd), (d, i)) =>
          (when(d < bd, lit(i.toLong)).otherwise(bi), when(d < bd, d).otherwise(bd))
      }
      pts.select(col("vec_id"), col("v"), best._1.as("cluster"), best._2.as("dist2"))
    }

    val seedRows = pts
      .filter(col("vec_id") < k)
      .orderBy(col("vec_id"))
      .collect()
    // ids must be EXACTLY 0..k-1: a duplicate id below k would pass a
    // bare row count while leaving one seed missing (and two identical)
    val seedIds = seedRows.map(_.getAs[Number]("vec_id").longValue).toSeq
    require(
      seedIds == (0L until k.toLong),
      s"need vec_id 0..${k - 1} present exactly once for deterministic init, " +
        s"got ids ${seedIds.mkString(",")}")
    var centroids: Array[Array[Double]] =
      seedRows.map(_.getSeq[Double](1).toArray.map(quant))
    val dim = centroids(0).length

    for (_ <- 1 to iters) {
      val means = assign(centroids)
        .select(col("cluster"), posexplode(col("v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (c, rows) =>
          val arr = new Array[Double](dim)
          rows.foreach(r => arr(r.getInt(1)) = quant(r.getDouble(2)))
          c.toInt -> arr
        }
      centroids = centroids.indices.map(c => means.getOrElse(c, centroids(c))).toArray
    }
    assign(centroids)
  }

  /** SemDeDup-style SEMANTIC near-dup pairs: k-means first, then exact
    * cosine only WITHIN each cluster — the candidate-generation-first
    * shape of every dedup operator here, with the cluster as the bucket:
    * pair work drops from O(n²) to O(n²/k) (choose k ∝ corpus size to
    * bound cluster width; the cluster join key also partitions the
    * shuffle). Cosine is an ordered fold, so the DuckDB oracle replays it
    * exactly on top of the k-means oracle chain.
    *
    * Output: (cluster, id_a, id_b, cos) for pairs with cosine above
    * `threshold` (strict), id_a < id_b.
    */
  def semanticNearDupPairs(
      emb: DataFrame,
      k: Int = 4,
      iters: Int = 1,
      threshold: Double = 0.3
  ): DataFrame = {
    VectorCosine.register(emb.sparkSession)
    val assigned = kmeansAssign(emb, k, iters)
    val a = assigned.select(
      col("cluster"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = assigned.select(
      col("cluster"), col("vec_id").as("id_b"), col("v").as("vb"))
    // compiled one-pass kernel — bit-identical to the ordered-fold HOF
    // form (each accumulator folds in index order), so oracle parity holds
    val cos = cosCol("va", "vb")
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cos)
      .filter(col("cos") > threshold)
      .select(col("cluster"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Driver-side spherical k-means on the (bounded) training sample:
    * deterministic init from the first k sample vectors, cosine
    * assignment, mean update; empty cells keep their previous centroid.
    */
  private def trainKMeans(
      sample: Array[Array[Float]],
      k: Int,
      dim: Int,
      iters: Int
  ): Array[Double] = {
    require(sample.nonEmpty, "empty training sample")
    val flat = new Array[Double](k * dim)
    for (c <- 0 until k; i <- 0 until dim)
      flat(c * dim + i) = sample(c % sample.length)(i).toDouble
    var centroids = flat
    for (_ <- 0 until iters) {
      val normed = graft.functions.NearestCentroids.normalize(centroids, k, dim)
      val sums = new Array[Double](k * dim)
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0
          var i = 0
          while (i < math.min(dim, v.length)) { dot += v(i) * normed(c * dim + i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < math.min(dim, v.length)) { sums(best * dim + i) += v(i); i += 1 }
        counts(best) += 1
      }
      val next = centroids.clone()
      // Mean components snap to the 2^-20 binary grid (the q99/kmeansAssign
      // trick): the per-cell sum is the one reduction-order-dependent step
      // in training, and the grid absorbs last-ulp differences so a
      // relational replay (GROUP BY sum in any order) reconstructs the
      // identical quantizer. Seeds are raw float->double casts (already
      // exact cross-engine); dots/norms are positional folds (ditto).
      for (c <- 0 until k if counts(c) > 0; i <- 0 until dim)
        next(c * dim + i) =
          math.floor(sums(c * dim + i) / counts(c) * 1048576.0) / 1048576.0
      centroids = next
    }
    centroids
  }

  /** Weiszfeld geometric median of the embedding cloud — the ROBUST
    * centroid (minimizer of Σ‖x−y‖, not Σ‖x−y‖²): a handful of
    * corrupted/outlier embeddings drag the mean arbitrarily far but move
    * the geometric median almost not at all, which is why robust
    * aggregation (e.g. against poisoned or degenerate shards) medians
    * instead of averages.
    *
    * Iteration y ← Σ(xᵢ/dᵢ)/Σ(1/dᵢ), dᵢ = ‖xᵢ−y‖, from the
    * coordinate-wise mean; rows within `eps` of the current iterate drop
    * out of both sums (the standard singularity guard). Scale shape:
    * corpus-side work per iteration is one scan (distance fold +
    * per-dim weighted sums, map-side combined into 64+1 cells); the
    * iterate itself is bounded model state on the driver — the
    * k-means/PQ posture. Every reduction-order-dependent aggregate
    * (mean, weighted sums, weight total) snaps to the 2⁻²⁰ binary grid,
    * and distance folds are ordered positional folds, so a relational
    * replay reconstructs the identical iterates ([[kmeansAssign]]'s
    * contract; same documented residual ulp-at-grid-boundary risk).
    *
    * Output: one row per dimension (pos, mean_coord, gmedian_coord) —
    * the non-robust mean rides along as the comparison column.
    */
  def geometricMedian(emb: DataFrame, iters: Int = 2, eps: Double = 1e-9): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val pts = emb
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      // consumed once per iteration plus the mean pass
      .localCheckpoint()
    def quant(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0
    val meanRows = pts
      .select(posexplode(col("v")))
      .groupBy(col("pos"))
      .agg(avg(col("col")).as("m"))
      .collect()
    val dim = meanRows.length
    val mean = new Array[Double](dim)
    meanRows.foreach(r => mean(r.getInt(0)) = quant(r.getDouble(1)))
    var y = mean.clone()
    for (_ <- 1 to iters) {
      val yarr = array(y.map(lit): _*)
      val dist = sqrt(
        aggregate(
          zip_with(col("v"), yarr, (a, b) => (a - b) * (a - b)),
          lit(0.0),
          (acc, x) => acc + x))
      val weighted = pts
        .withColumn("dist", dist)
        .filter(col("dist") > eps)
        .withColumn("w", lit(1.0) / col("dist"))
        .localCheckpoint() // two consumers: weight total + per-dim sums
      val denom = quant(weighted.agg(sum(col("w"))).head().getDouble(0))
      val next = y.clone()
      weighted
        .select(col("w"), posexplode(col("v")))
        .groupBy(col("pos"))
        .agg(sum(col("col") * col("w")).as("s"))
        .collect()
        .foreach(r => next(r.getInt(0)) = quant(quant(r.getDouble(1)) / denom))
      y = next
    }
    val spark = emb.sparkSession
    import spark.implicits._
    // HALF_UP (away from zero) ≡ Spark/DuckDB round(); rint's half-even
    // would diverge on grid values that land exactly on a half-microunit
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    y.zip(mean).zipWithIndex
      .map { case ((g, m), i) => (i, r6(m), r6(g)) }
      .toSeq
      .toDF("pos", "mean_coord", "gmedian_coord")
  }
}
