package graft.queries

import graft.sources.Tables

/** Round-15 additions (q416+): the corpus-quality audits between dedup
  * and training — segment-granular duplicate-token accounting (the
  * removal-rate table ExactSubstr dedup reports, Lee et al. 2022),
  * embedding prototypicality banding (SemDeDup/D4-style centroid
  * distance filtering, Abbas et al. 2023), a nearest-centroid label
  * noise confusion matrix (Confident Learning shape, Northcutt et al.
  * 2021), per-source Zipf power-law fits (the classic corpus health
  * check), and the one-row-per-source dataset card every release
  * ships. House invariants: per-row float quantities quantize to
  * integer micro-units (2²⁰) and ride exact BIGINT sums so aggregation
  * order can never split the engines; final ratios snap to the dyadic
  * 2⁻³⁰ grid.
  */
object Round15 {

  /** floor(x·2³⁰ + ½)/2³⁰, parenthesized so it composes; grid constant
    * CAST to DOUBLE (see Round13.snap for the DECIMAL-collapse trap).
    */
  private def snap(x: String): String =
    s"(floor(($x) * CAST(1073741824 AS DOUBLE) + 0.5) / CAST(1073741824 AS DOUBLE))"

  /** floor(x·2²⁰ + ½) AS BIGINT — the exact-integer carrier for per-row
    * float statistics (sums of these are aggregation-order-exact).
    */
  private def qi(x: String): String =
    s"CAST(floor(($x) * CAST(1048576 AS DOUBLE) + 0.5) AS BIGINT)"

  /** (source, doc_id, rnk, word): kept tokens with their contiguous
    * per-doc rank (0-based over kept order — boundary empties from the
    * split don't leave gaps). Shared by q416/q419/q420.
    */
  private def tokCte(tbl: String, spark: Boolean): String =
    if (spark)
      // r13 optimization (guide §2): `pos` of the EMPTY-FILTERED array is
      // exactly the old `row_number() OVER (PARTITION BY doc_id ORDER BY
      // pos) - 1` — the window only re-numbered the surviving words in
      // their original order — so filtering inside the array before
      // posexplode removes one full Exchange+Sort+Window pass over the
      // exploded token stream from every consumer. Same rows, same rnk.
      s"""SELECT source, doc_id, CAST(pos AS BIGINT) AS rnk, word
          FROM (SELECT source, doc_id,
                       posexplode(filter(split(lower(text), '[^a-z]+'),
                                         w -> w <> '')) AS (pos, word)
                FROM $tbl) x"""
    else
      s"""SELECT source, doc_id,
                 CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
                      AS BIGINT) AS rnk,
                 word
          FROM (SELECT source, doc_id,
                       CAST(unnest(generate_series(1, len(parts))) AS INT) - 1 AS pos,
                       unnest(parts) AS word
                FROM (SELECT source, doc_id,
                             string_split_regex(lower(text), '[^a-z]+') AS parts
                      FROM $tbl)) x
          WHERE word <> ''"""

  /** (label, dim, m): per-label centroid of the embeddings table with
    * exact arithmetic — every float component quantizes to the 2²⁰
    * integer grid, per-(label,dim) sums are BIGINT, and the final mean
    * snaps. Shared by q417/q418. Spark `pos` is 0-based and DuckDB
    * `generate_subscripts` 1-based; dims only ever join within one
    * engine, so the offset is invisible.
    */
  private def centroidCte(tbl: String, spark: Boolean): String = {
    val e =
      if (spark)
        s"""SELECT vec_id, label, pos AS dim, CAST(col AS DOUBLE) AS v
            FROM (SELECT vec_id, label,
                         posexplode(transform(embedding, x -> CAST(x AS DOUBLE)))
                  FROM $tbl)"""
      else
        s"""SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM $tbl"""
    s"""e AS ($e),
        cent AS (
          SELECT label, dim,
                 ${snap(s"CAST(sum(${qi("v")}) AS DOUBLE) / (1048576.0 * count(*))")} AS m
          FROM e
          GROUP BY 1, 2)"""
  }

  // ---------------------------------------------------------------- q416

  /** Segment-granular duplicate-token accounting — the removal-rate
    * table an ExactSubstr dedup run reports (Lee et al. 2022 measure
    * ~3-8% of web-corpus tokens sit in repeated spans). Each document's
    * kept tokens chunk into consecutive 16-token segments (row-local),
    * a segment instance is DUPLICATE if the same text occurred earlier
    * in (doc_id, seg) order anywhere in the corpus, and per source the
    * table reports segment/token duplication rates. Wide shuffles: the
    * per-doc window and one md5-keyed window — both partial-friendly,
    * both on hashes, not text.
    */
  val q416SegmentDedup: QueryDef = QueryDef(
    "q416_segment_dedup",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("r15_documents")
      s.sql(segmentDedupSql(spark = true))
    },
    Some(segmentDedupSql(spark = false))
  )

  private def segmentDedupSql(spark: Boolean): String = {
    val tbl = if (spark) "r15_documents" else "documents"
    val phrase =
      if (spark)
        "array_join(transform(array_sort(array_agg(struct(rnk, word))), t -> t.word), ' ')"
      else "string_agg(word, ' ' ORDER BY rnk)"
    s"""WITH tok AS (${tokCte(tbl, spark)}),
        seg AS (
          SELECT source, doc_id,
                 CAST(floor(rnk / 16.0) AS BIGINT) AS seg_id,
                 md5($phrase) AS h,
                 CAST(count(*) AS BIGINT) AS n_tok
          FROM tok
          GROUP BY source, doc_id, CAST(floor(rnk / 16.0) AS BIGINT)),
        marked AS (
          SELECT source, n_tok,
                 CASE WHEN row_number() OVER
                        (PARTITION BY h ORDER BY doc_id, seg_id) >= 2
                      THEN 1 ELSE 0 END AS dup
          FROM seg)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(dup) AS BIGINT) AS n_dup_segments,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(dup * n_tok) AS BIGINT) AS n_dup_tokens,
               ${snap("CAST(sum(dup * n_tok) AS DOUBLE) / sum(n_tok)")} AS dup_token_rate
        FROM marked
        GROUP BY source
        ORDER BY source"""
  }

  // ---------------------------------------------------------------- q417

  /** Embedding prototypicality banding (SemDeDup / D4 posture, Abbas et
    * al. 2023): cosine of every vector to its OWN label centroid, then
    * per label a cume_dist band — the bottom decile (outliers/noise)
    * and top decile (over-prototypical near-dups) are marked for drop,
    * the middle 80% kept. Exact path: quantized component sums for the
    * centroid, quantized per-dim products for the dot/norms, snapped
    * cosine, total-order (cos, vec_id) banding. Corpus-sized work is
    * one explode + two keyed aggs; centroids are #labels×#dims rows
    * (broadcast at scale).
    */
  val q417Prototypicality: QueryDef = QueryDef(
    "q417_prototypicality",
    (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("r15_embeddings")
      s.sql(prototypicalitySql(spark = true))
    },
    Some(prototypicalitySql(spark = false))
  )

  private def prototypicalitySql(spark: Boolean): String = {
    val tbl = if (spark) "r15_embeddings" else "embeddings"
    s"""WITH ${centroidCte(tbl, spark)},
        cn AS (
          SELECT label, CAST(sum(${qi("m * m")}) AS BIGINT) AS nrm2q
          FROM cent GROUP BY 1),
        dots AS (
          SELECT e.vec_id, e.label,
                 CAST(sum(${qi("e.v * c.m")}) AS BIGINT) AS dotq,
                 CAST(sum(${qi("e.v * e.v")}) AS BIGINT) AS vnrm2q
          FROM e JOIN cent c ON c.label = e.label AND c.dim = e.dim
          GROUP BY 1, 2),
        cos AS (
          SELECT d.vec_id, d.label,
                 ${snap("d.dotq / sqrt(CAST(d.vnrm2q AS DOUBLE) * cn.nrm2q)")} AS cos_c
          FROM dots d JOIN cn ON cn.label = d.label),
        banded AS (
          SELECT label, cos_c,
                 CASE WHEN cume_dist() OVER (PARTITION BY label ORDER BY cos_c, vec_id)
                        <= CAST(0.1 AS DOUBLE) THEN 'drop_outlier'
                      WHEN cume_dist() OVER (PARTITION BY label ORDER BY cos_c, vec_id)
                        > CAST(0.9 AS DOUBLE) THEN 'drop_neardup'
                      ELSE 'keep' END AS band
          FROM cos)
        SELECT label, band,
               CAST(count(*) AS BIGINT) AS n,
               ${snap("avg(cos_c)")} AS mean_cos,
               min(cos_c) AS min_cos,
               max(cos_c) AS max_cos
        FROM banded
        GROUP BY 1, 2
        ORDER BY 1, 2"""
  }

  // ---------------------------------------------------------------- q418

  /** Nearest-centroid label-noise audit (the Confident Learning joint
    * matrix shape, Northcutt et al. 2021): predict every vector's label
    * as the centroid with the highest snapped cosine (ties break to the
    * smaller label — a total order), emit the (label, pred_label)
    * confusion counts plus per-cell mean confidence. The candidate fan
    * is #vectors×#labels — at 100 TB the #labels×#dims centroid table
    * broadcasts and the fan stays a map-side explode, no shuffle growth.
    */
  val q418LabelNoise: QueryDef = QueryDef(
    "q418_label_noise",
    (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("r15_embeddings")
      s.sql(labelNoiseSql(spark = true))
    },
    Some(labelNoiseSql(spark = false))
  )

  private def labelNoiseSql(spark: Boolean): String = {
    val tbl = if (spark) "r15_embeddings" else "embeddings"
    s"""WITH ${centroidCte(tbl, spark)},
        cn AS (
          SELECT label, CAST(sum(${qi("m * m")}) AS BIGINT) AS nrm2q
          FROM cent GROUP BY 1),
        dots AS (
          SELECT e.vec_id, e.label, c.label AS cand,
                 CAST(sum(${qi("e.v * c.m")}) AS BIGINT) AS dotq,
                 CAST(sum(${qi("e.v * e.v")}) AS BIGINT) AS vnrm2q
          FROM e JOIN cent c ON c.dim = e.dim
          GROUP BY 1, 2, 3),
        scored AS (
          SELECT d.vec_id, d.label, d.cand,
                 ${snap("d.dotq / sqrt(CAST(d.vnrm2q AS DOUBLE) * cn.nrm2q)")} AS cos_c
          FROM dots d JOIN cn ON cn.label = d.cand),
        best AS (
          SELECT vec_id, label, cand AS pred, cos_c
          FROM (SELECT *, row_number() OVER
                  (PARTITION BY vec_id ORDER BY cos_c DESC, cand) AS rn
                FROM scored)
          WHERE rn = 1)
        SELECT label, pred,
               CAST(count(*) AS BIGINT) AS n,
               ${snap("avg(cos_c)")} AS mean_conf
        FROM best
        GROUP BY 1, 2
        ORDER BY 1, 2"""
  }

  // ---------------------------------------------------------------- q419

  /** Per-source Zipf power-law fit: least squares of ln(count) on
    * ln(rank) over each source's top-100 word types (rank by count
    * desc, word asc — total order). The regression's five sufficient
    * statistics ride quantized-integer sums (ln values ≤ ~12, products
    * ≤ ~150 → ≤2⁴⁸ micro-units; Σ over 100 terms is exact BIGINT), so
    * slope/intercept/R² are bit-identical across engines. A healthy
    * natural-language source fits slope ≈ −1.
    */
  val q419ZipfFit: QueryDef = QueryDef(
    "q419_zipf_fit",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("r15_documents")
      s.sql(zipfSql(spark = true))
    },
    Some(zipfSql(spark = false))
  )

  private def zipfSql(spark: Boolean): String = {
    val tbl = if (spark) "r15_documents" else "documents"
    val deq = "CAST(1048576 AS DOUBLE)"
    s"""WITH tok AS (${tokCte(tbl, spark)}),
        wc AS (
          SELECT source, word, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2),
        ranked AS (
          SELECT source,
                 CAST(row_number() OVER
                   (PARTITION BY source ORDER BY c DESC, word) AS BIGINT) AS r,
                 c
          FROM wc),
        pts AS (
          SELECT source,
                 ${qi("ln(CAST(r AS DOUBLE))")} AS xq,
                 ${qi("ln(CAST(c AS DOUBLE))")} AS yq,
                 ${qi("ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))")} AS xyq,
                 ${qi("ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))")} AS xxq,
                 ${qi("ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))")} AS yyq
          FROM ranked
          WHERE r <= 100),
        s AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(xq) AS DOUBLE) / $deq AS sx,
                 CAST(sum(yq) AS DOUBLE) / $deq AS sy,
                 CAST(sum(xyq) AS DOUBLE) / $deq AS sxy,
                 CAST(sum(xxq) AS DOUBLE) / $deq AS sxx,
                 CAST(sum(yyq) AS DOUBLE) / $deq AS syy
          FROM pts GROUP BY 1)
        SELECT source, n AS n_types,
               ${snap("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope,
               ${snap("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n")}
                 AS intercept,
               CASE WHEN n * syy - sy * sy <= 0 THEN NULL
                    ELSE ${snap("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))")}
               END AS r2
        FROM s
        ORDER BY source"""
  }

  // ---------------------------------------------------------------- q420

  /** The dataset card: one row per source with the release-notes
    * numbers — document/token counts (exact), exact-duplicate rate
    * (md5), language-mix entropy in nats (exact counts, quantized
    * per-lang terms), mean and lower-median tokens per doc. Everything
    * derives from two keyed aggs over one scan; the median is an exact
    * order statistic (row_number = floor((n+1)/2) on a total order),
    * not an interpolating quantile, so both engines pick the same
    * element.
    */
  val q420DatasetCard: QueryDef = QueryDef(
    "q420_dataset_card",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("r15_documents")
      s.sql(datasetCardSql(spark = true))
    },
    Some(datasetCardSql(spark = false))
  )

  private def datasetCardSql(spark: Boolean): String = {
    val tbl = if (spark) "r15_documents" else "documents"
    val nWords =
      if (spark) "CAST(regexp_count(lower(text), '[a-z]+') AS BIGINT)"
      else "CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)"
    s"""WITH d AS (
          SELECT source, doc_id, lang, md5(text) AS h, $nWords AS nw
          FROM $tbl),
        base AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT h) AS BIGINT) AS n_unique_docs
          FROM d GROUP BY 1),
        med AS (
          SELECT source, nw AS median_tokens
          FROM (SELECT source, nw,
                       row_number() OVER
                         (PARTITION BY source ORDER BY nw, doc_id) AS rn,
                       count(*) OVER (PARTITION BY source) AS n
                FROM d) x
          WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)),
        lc AS (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        ent AS (
          SELECT lc.source,
                 CAST(sum(${qi("-(CAST(lc.c AS DOUBLE) / b.n_docs) * ln(CAST(lc.c AS DOUBLE) / b.n_docs)")})
                      AS DOUBLE) / 1048576.0 AS hq
          FROM lc JOIN base b ON b.source = lc.source
          GROUP BY 1)
        SELECT b.source, b.n_docs, b.n_tokens, b.n_unique_docs,
               ${snap("1.0 - CAST(b.n_unique_docs AS DOUBLE) / b.n_docs")} AS dup_rate,
               ${snap("CAST(b.n_tokens AS DOUBLE) / b.n_docs")} AS mean_tokens,
               m.median_tokens,
               ${snap("e.hq")} AS lang_entropy_nats
        FROM base b
        JOIN med m ON m.source = b.source
        JOIN ent e ON e.source = b.source
        ORDER BY b.source"""
  }

  val all: Seq[QueryDef] =
    Seq(q416SegmentDedup, q417Prototypicality, q418LabelNoise,
      q419ZipfFit, q420DatasetCard)
}
