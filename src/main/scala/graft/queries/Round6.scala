package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Round-6 additions (q123+).
  *
  * Scale-path upgrades to existing families: IVF-PQ composed ANN (the
  * cell-pruned replacement for the full-corpus PQ ADC scan), plus
  * corpus-curation operators a 100 TB training pipeline runs between
  * dedup and packing: cross-document line-level dedup (the C4 trick) and
  * others as the round progresses.
  */
object Round6 {

  /** IVF-PQ ANN ([[graft.operators.Similarity.ivfPqTopK]]): coarse cells
    * prune candidates, PQ codes compress scoring, exact rerank restores
    * true cosines. ORACLE-CHECKED end to end including BOTH model builds
    * ([[AnnReplaySql]]): DuckDB replays the coarse-quantizer training
    * (q46's replay), the PQ codebook training (q80's replay, 2
    * iterations here), then the composed retrieval — nprobe cell
    * pruning, ADC scoring of only the probed cells' members as ordered
    * subspace folds, top-32 exact-cosine rerank. Exact-score parity,
    * recall floor and the no-crossJoin plan shape remain pinned in
    * OperatorsSpec/PlanAuditSpec.
    */
  val q123AnnIvfPq: QueryDef = QueryDef(
    "q123_ann_ivfpq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    Some(s"""WITH ${AnnReplaySql.preambleSql},
            ${AnnReplaySql.ivfModelSql(2)},
            ${AnnReplaySql.pqModelSql(2)},
            adc AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                           ${AnnReplaySql.adcFold("cd.codes")} AS adc
                    FROM probes pr
                    JOIN assign a ON a.cell = pr.cell AND a.vec_id != pr.query_id
                    JOIN codes cd ON cd.vec_id = a.vec_id
                    JOIN luts l ON l.query_id = pr.query_id
                    CROSS JOIN nlist n),
            cand AS (SELECT query_id, neighbor_id FROM (
                       SELECT query_id, neighbor_id, row_number() OVER (
                         PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS rn
                       FROM adc) WHERE rn <= 32),
            ${AnnReplaySql.rerankSql(5)}""")
  )

  /** REAL image decode in the correctness gate: each document becomes a
    * genuine PNG (deterministic per-doc gradient raster, JDK ImageIO
    * encode), decoded back through
    * [[graft.operators.Multimodal.ImageIoCodec]] — actual compressed
    * bytes in, actual raster out. The reported width/height/mean
    * luminance have closed forms, so DuckDB verifies the WHOLE
    * encode→decode trip arithmetically without ever touching an image:
    * any codec deviation (dimension swap, color management, truncation)
    * breaks the hash match. Payload size is deliberately NOT emitted —
    * PNG encoder output is JRE-specific; raster content is not.
    */
  val q124ImageRoundtrip: QueryDef = QueryDef(
    "q124_image_roundtrip",
    (s, dir) => {
      import s.implicits._
      val media = Tables
        .documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 + id % 17).toInt
            val h = (16 + id % 13).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((x * 7 + y * 13 + id) % 256).toInt
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }
        .toDF("doc_id", "payload")
      graft.operators.Multimodal
        .decodeMeta(media, graft.operators.Multimodal.ImageIoCodec)
        .select(
          col("doc_id"),
          col("width"),
          col("height"),
          round(col("mean_byte"), 6).as("mean_lum"))
    },
    Some("""WITH dims AS (
              SELECT doc_id,
                     CAST(16 + doc_id % 17 AS INT) AS width,
                     CAST(16 + doc_id % 13 AS INT) AS height
              FROM documents),
            px AS (
              SELECT d.doc_id, d.width, d.height,
                     avg(CAST((x.x * 7 + y.y * 13 + d.doc_id) % 256 AS DOUBLE)) AS m
              FROM dims d
              JOIN range(0, 33) x(x) ON x.x < d.width
              JOIN range(0, 29) y(y) ON y.y < d.height
              GROUP BY 1, 2, 3)
            SELECT doc_id, width, height, round(m, 6) AS mean_lum FROM px""")
  )

  /** Data-driven mixture balancing
    * ([[graft.operators.Sampling.balancedSample]]): language strata
    * equalized to the smallest one, rates computed FROM the corpus
    * (integer per-mille arithmetic — exact in both engines), applied as
    * the usual row-local identity-hash filter. The oracle recomputes
    * counts → rates → survivors relationally.
    */
  val q125BalancedSample: QueryDef = QueryDef(
    "q125_balanced_sample",
    (s, dir) => {
      graft.operators.Sampling
        .balancedSample(Tables.documents(s, dir), strataCol = "lang", idCol = "doc_id")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            m AS (SELECT min(n) AS mn FROM c),
            r AS (SELECT lang, (1000 * mn) // n AS keep_pm FROM c, m)
            SELECT d.lang, count(*) AS n_kept,
                   CAST(sum(d.doc_id) AS BIGINT) AS id_sum
            FROM documents d
            JOIN r ON r.lang = d.lang
            WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || 'v1'), 1, 8))
                       AS BIGINT) % 1000 < r.keep_pm
            GROUP BY d.lang""")
  )

  /** Unigram LM quality scoring
    * ([[graft.operators.TextAnalysis.unigramLogProb]]) — the perplexity-
    * filter shape: corpus-derived token probabilities, per-doc mean log
    * prob. Two token-keyed exchanges, nothing per-document until the
    * final aggregate.
    */
  val q126UnigramLogprob: QueryDef = QueryDef(
    "q126_unigram_logprob",
    (s, dir) =>
      graft.operators.TextAnalysis.unigramLogProb(Tables.documents(s, dir)),
    Some("""WITH tok AS (
              SELECT doc_id, t FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE t <> ''),
            tot AS (SELECT count(*) AS total FROM tok),
            freq AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t)
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS mean_ll
            FROM tok JOIN freq USING (t), tot
            GROUP BY doc_id""")
  )

  /** Dedup RETENTION POLICY — the step after pair detection that decides
    * what survives: near-dup pairs (MinHash+LSH) → connected components
    * → keep the highest-quality member per cluster (longest text,
    * doc_id tie-break). Emits one row per non-trivial cluster:
    * (cluster_rep, keep_id, cluster_size). The oracle replays the
    * quadratic pair set, the recursive-CTE closure and the argmax.
    */
  val q127DedupRetention: QueryDef = QueryDef(
    "q127_dedup_retention",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val cc = graft.operators.Dedup
        .connectedComponents(graft.operators.Dedup.minhashPairs(docs))
      val labeled = docs
        .join(cc, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("cluster_rep"), col("doc_id")).as("rep"),
          col("n_chars"))
      val w = Window
        .partitionBy(col("rep"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      labeled
        .withColumn("rk", row_number().over(w))
        .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("rep"))))
        .filter(col("rk") === 1 && col("sz") > 1)
        .select(
          col("rep").as("cluster_rep"),
          col("doc_id").as("keep_id"),
          col("sz").as("cluster_size"))
    },
    Some(s"""WITH RECURSIVE pairs AS (${LlmQueries.ngramJaccardOracle}),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b AS u, doc_a AS v FROM pairs),
            reach AS (
              SELECT u AS doc, u AS label FROM edges
              UNION
              SELECT e.u AS doc, r.label
              FROM edges e JOIN reach r ON r.doc = e.v),
            labels AS (SELECT doc, min(label) AS rep FROM reach GROUP BY doc),
            clusters AS (
              SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep, d.n_chars
              FROM documents d LEFT JOIN labels l ON l.doc = d.doc_id),
            ranked AS (
              SELECT rep, doc_id,
                     row_number() OVER (PARTITION BY rep
                                        ORDER BY n_chars DESC, doc_id) AS rk,
                     count(*) OVER (PARTITION BY rep) AS sz
              FROM clusters)
            SELECT CAST(rep AS BIGINT) AS cluster_rep,
                   CAST(doc_id AS BIGINT) AS keep_id,
                   CAST(sz AS BIGINT) AS cluster_size
            FROM ranked WHERE rk = 1 AND sz > 1""")
  )

  /** Time-series RESAMPLE + forward fill: per-user minute grid
    * (`sequence` explode between observed bounds), left join of the
    * minute aggregates, `last(..., ignoreNulls)` running frame carries
    * the last observation forward across gaps. The gaps-and-grid shape
    * of feature-store backfills; the grid is span-bounded (not
    * row-bounded), so data growth doesn't grow it.
    */
  val q128GapFill: QueryDef = QueryDef(
    "q128_gap_fill",
    (s, dir) => {
      val ev = Tables
        .events(s, dir)
        .filter(col("user_id") < 6 && col("ts") < lit("2024-01-08").cast("timestamp"))
        .withColumn("minute", date_trunc("minute", col("ts")))
      val perMin = ev
        .groupBy(col("user_id"), col("minute"))
        .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n_obs"))
      val grid = ev
        .groupBy(col("user_id"))
        .agg(min(col("minute")).as("mn"), max(col("minute")).as("mx"))
        .select(
          col("user_id"),
          explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 MINUTE"))).as("minute"))
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("minute"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(perMin, Seq("user_id", "minute"), "left")
        .select(
          col("user_id"),
          unix_micros(col("minute")).as("minute_us"),
          last(col("v"), ignoreNulls = true).over(w).as("v_ff"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    },
    Some("""WITH ev AS (
              SELECT user_id, date_trunc('minute', ts) AS minute, value
              FROM events
              WHERE user_id < 6 AND ts < TIMESTAMP '2024-01-08'),
            pm AS (
              SELECT user_id, minute, round(sum(value), 2) AS v,
                     count(*) AS n_obs
              FROM ev GROUP BY 1, 2),
            b AS (SELECT user_id, min(minute) AS mn, max(minute) AS mx
                  FROM ev GROUP BY 1),
            grid AS (
              SELECT user_id,
                     unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute
              FROM b),
            j AS (
              SELECT g.user_id, g.minute, pm.v, coalesce(pm.n_obs, 0) AS n_obs
              FROM grid g LEFT JOIN pm ON pm.user_id = g.user_id
                                      AND pm.minute = g.minute)
            SELECT user_id, CAST(epoch_us(minute) AS BIGINT) AS minute_us,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY minute
                     ROWS UNBOUNDED PRECEDING) AS v_ff,
                   CAST(n_obs AS BIGINT) AS n_obs
            FROM j""")
  )

  /** BM25 retrieval scoring
    * ([[graft.operators.TextAnalysis.bm25Scores]]): Okapi term scores
    * with the Lucene idf form for a fixed 3-term query — the ranking
    * core of corpus search / RAG retrieval. Only matching postings flow
    * past the (tiny) term filter; both engines execute the identical
    * arithmetic chain, rounded at 6.
    */
  val q129Bm25: QueryDef = QueryDef(
    "q129_bm25",
    (s, dir) =>
      graft.operators.TextAnalysis
        .bm25Scores(Tables.documents(s, dir), Seq("data", "query", "stream")),
    Some("""WITH tok AS (
              SELECT doc_id, t FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE t <> ''),
            dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
            c AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
            q AS (SELECT doc_id, t, count(*) AS tf FROM tok
                  WHERE t IN ('data', 'query', 'stream') GROUP BY 1, 2),
            idf AS (SELECT t, count(DISTINCT doc_id) AS dfc FROM tok
                    WHERE t IN ('data', 'query', 'stream') GROUP BY t),
            scored AS (
              SELECT q.doc_id,
                     ln((c.n_docs - idf.dfc + 0.5) / (idf.dfc + 0.5) + 1.0)
                       * q.tf * (1.2 + 1.0)
                       / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avgdl)) AS ts
              FROM q JOIN idf USING (t) JOIN dl USING (doc_id), c)
            SELECT doc_id, count(*) AS n_terms_hit, round(sum(ts), 6) AS bm25
            FROM scored GROUP BY doc_id""")
  )

  /** One-scan column profiling ([[graft.operators.Checks.profile]]):
    * null/distinct/min/max per column from a single `agg`, exploded to
    * per-column rows. Profiled over a projection with injected nulls so
    * the null path is exercised; min/max stringified so heterogeneous
    * columns share a schema.
    */
  val q130Profile: QueryDef = QueryDef(
    "q130_profile",
    (s, dir) => {
      val src = Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          when(col("c_custkey") % 10 === 0, lit(null))
            .otherwise(col("c_nationkey"))
            .cast("long")
            .as("nk"),
          col("c_acctbal"),
          col("c_mktsegment"))
      graft.operators.Checks
        .profile(src, Seq("c_custkey", "nk", "c_acctbal", "c_mktsegment"))
    },
    Some("""WITH src AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 10 = 0 THEN NULL
                          ELSE c_nationkey END AS nk,
                     c_acctbal, c_mktsegment
              FROM customer)
            SELECT 'c_custkey' AS "column",
                   CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
                   CAST(min(c_custkey) AS VARCHAR) AS min_s,
                   CAST(max(c_custkey) AS VARCHAR) AS max_s FROM src
            UNION ALL
            SELECT 'nk', CAST(count(*) FILTER (nk IS NULL) AS BIGINT),
                   CAST(count(DISTINCT nk) AS BIGINT),
                   CAST(min(nk) AS VARCHAR), CAST(max(nk) AS VARCHAR) FROM src
            UNION ALL
            SELECT 'c_acctbal', CAST(count(*) FILTER (c_acctbal IS NULL) AS BIGINT),
                   CAST(count(DISTINCT c_acctbal) AS BIGINT),
                   CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src
            UNION ALL
            SELECT 'c_mktsegment', CAST(count(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
                   CAST(count(DISTINCT c_mktsegment) AS BIGINT),
                   CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src""")
  )

  /** SCD Type-2 dimension build: a change log (orders as status changes
    * per customer, ordered by date with key tie-break) becomes validity
    * intervals — eff_from = change ts, eff_to = `lead` of the next
    * change (NULL = current), is_current flag. One window per key; the
    * standard way a warehouse derives history tables from CDC streams.
    * Consecutive same-value changes are collapsed first (lag compare) so
    * each interval is a real transition.
    */
  val q131Scd2: QueryDef = QueryDef(
    "q131_scd2",
    (s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("ts"), col("o_orderkey"))
      val changes = Tables
        .orders(s, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("ts"),
          col("o_orderstatus").as("status"))
        .withColumn("prev", lag(col("status"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("status"))
      val w2 = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("ts"), col("o_orderkey"))
      changes
        .select(
          col("o_custkey"),
          col("status"),
          unix_micros(col("ts")).as("eff_from_us"),
          unix_micros(lead(col("ts"), 1).over(w2)).as("eff_to_us"),
          (lead(col("ts"), 1).over(w2).isNull).as("is_current"))
    },
    Some("""WITH ordered AS (
              SELECT o_custkey, o_orderkey,
                     CAST(o_orderdate AS TIMESTAMP) AS ts,
                     o_orderstatus AS status,
                     lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey) AS prev
              FROM orders),
            changes AS (
              SELECT o_custkey, o_orderkey, ts, status FROM ordered
              WHERE prev IS NULL OR prev <> status)
            SELECT o_custkey, status,
                   CAST(epoch_us(ts) AS BIGINT) AS eff_from_us,
                   CAST(epoch_us(lead(ts) OVER w) AS BIGINT) AS eff_to_us,
                   (lead(ts) OVER w IS NULL) AS is_current
            FROM changes
            WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, o_orderkey)""")
  )

  /** Funnel analysis: per-user ordered progression through
    * view → click → purchase (first-occurrence timestamps must chain).
    * One scan computes each user's first ts per stage (conditional min);
    * the funnel counts fall out of flag aggregation — no self-joins, no
    * per-stage passes, which is what keeps this a single shuffle at any
    * scale.
    */
  val q132Funnel: QueryDef = QueryDef(
    "q132_funnel",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val perUser = ev
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L)).as("n_clicked_after_view"),
        sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_buy"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
    },
    Some("""WITH pu AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                     min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                     min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
              FROM events GROUP BY user_id)
            SELECT count(*) AS n_users,
                   CAST(count(*) FILTER (t_view IS NOT NULL) AS BIGINT) AS n_viewed,
                   CAST(count(*) FILTER (t_view < t_click) AS BIGINT) AS n_clicked_after_view,
                   CAST(count(*) FILTER (t_view < t_click AND t_click < t_buy) AS BIGINT)
                     AS n_full_funnel
            FROM pu""")
  )

  /** INT8 embedding quantization
    * ([[graft.operators.Similarity.quantizeInt8]]): per-vector symmetric
    * scale, explicit floor(x/s + 0.5) rounding (engine-independent where
    * `round`'s tie convention is not), round-trip error stats. The
    * integer code sum pins every code exactly; the error columns pin the
    * reconstruction. All row-local — the 4× storage compression of a
    * 100 TB vector corpus is a pure scan.
    */
  val q133EmbedQuant: QueryDef = QueryDef(
    "q133_embed_quant",
    (s, dir) => {
      graft.operators.Similarity
        .quantizeInt8(Tables.embeddings(s, dir))
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale_r"),
          expr("aggregate(codes, 0L, (a, c) -> a + c)").as("code_sum"),
          round(array_max(col("__errs")), 6).as("max_err"),
          round(
            expr("aggregate(__errs, cast(0.0 as double), (a, e) -> a + e)")
              / size(col("__errs")), 6).as("mean_err"))
    },
    Some("""WITH q AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                     list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
              FROM embeddings),
            s AS (
              SELECT vec_id, v,
                     CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale
              FROM q),
            c AS (
              SELECT vec_id, v, scale,
                     list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS codes
              FROM s),
            e AS (
              SELECT vec_id, scale, codes,
                     [abs(codes[i] * scale - v[i]) FOR i IN range(1, len(v) + 1)] AS errs
              FROM c)
            SELECT vec_id, round(scale, 6) AS scale_r,
                   CAST(list_sum(codes) AS BIGINT) AS code_sum,
                   round(list_max(errs), 6) AS max_err,
                   round(list_sum(errs) / len(errs), 6) AS mean_err
            FROM e""")
  )

  /** RAG sliding-window chunking
    * ([[graft.operators.TextAnalysis.slidingChunks]]): 32-token windows
    * every 24 tokens (8-token overlap), chunk text pinned by md5 so the
    * whole window arithmetic — starts, widths, tail clamping — is
    * hash-checked without shipping the text twice.
    */
  val q134RagChunks: QueryDef = QueryDef(
    "q134_rag_chunks",
    (s, dir) => {
      graft.operators.TextAnalysis
        .slidingChunks(Tables.documents(s, dir), width = 32, stride = 24)
        .select(
          col("doc_id"),
          col("chunk_id"),
          md5(col("chunk_text")).as("chunk_md5"),
          col("n_tok").cast("int").as("n_tok"))
    },
    Some("""WITH t AS (
              SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
            nz AS (SELECT doc_id, ts FROM t WHERE len(ts) > 0),
            g AS (
              SELECT doc_id, ts,
                     unnest(range(0, (len(ts) - 1) // 24 + 1)) AS i
              FROM nz),
            ch AS (
              SELECT doc_id, CAST(i AS INT) AS chunk_id,
                     array_to_string(ts[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
              FROM g)
            SELECT doc_id, chunk_id, md5(chunk_text) AS chunk_md5,
                   CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tok
            FROM ch""")
  )

  /** Text normalization for engine-independent dedup/join keys
    * ([[graft.operators.TextAnalysis.normalizeText]]): planted mixed
    * case, punctuation and non-ASCII, then lower → strip [^a-z0-9 ] →
    * collapse spaces → trim; the normalized form is md5-pinned. The
    * regex classes are portable between Java regex and RE2 (the
    * precondition for cross-system keys).
    */
  val q135Normalize: QueryDef = QueryDef(
    "q135_normalize",
    (s, dir) => {
      val messy = concat(
        lit("  Hello, WORLD!! "),
        col("text"),
        lit(" #"),
        col("doc_id").cast("string"),
        lit("... café  "))
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          graft.operators.TextAnalysis.normalizeText(messy).as("norm"))
        .select(
          col("doc_id"),
          md5(col("norm")).as("norm_md5"),
          length(col("norm")).cast("int").as("n_norm_chars"))
    },
    Some("""WITH m AS (
              SELECT doc_id,
                     '  Hello, WORLD!! ' || text || ' #' || CAST(doc_id AS VARCHAR)
                       || '... café  ' AS messy
              FROM documents),
            n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(messy),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
              FROM m)
            SELECT doc_id, md5(norm) AS norm_md5,
                   CAST(length(norm) AS INT) AS n_norm_chars
            FROM n""")
  )

  /** One BPE merge step as DuckDB CTEs: overlapping adjacent-pair counts
    * weighted by word frequency, the (freq DESC, left, right) argmax, and
    * the greedy left-to-right merge. Greedy overlap (only when
    * left == right) is reproduced with a run-parity window: consecutive
    * match positions form a run, and exactly the odd-ranked matches in
    * each run merge — provably what the JVM fold does, since for
    * left ≠ right two adjacent positions can never both match.
    */
  private def bpeStepSql(i: Int): String = {
    val prev = s"t${i - 1}"
    s"""p$i AS (SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS f
               FROM (SELECT freq, unnest([{'a': toks[j], 'b': toks[j + 1]}
                                          FOR j IN range(1, len(toks))]) AS pr
                     FROM $prev)
               GROUP BY 1, 2),
       top$i AS (SELECT a, b, f FROM p$i ORDER BY f DESC, a ASC, b ASC LIMIT 1),
       e$i AS (SELECT word, freq, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
               FROM $prev),
       mm$i AS (SELECT e.word, e.freq, e.pos, e.tok, t.a, t.b,
                       (e.tok = t.a AND
                        lead(e.tok) OVER (PARTITION BY e.word ORDER BY e.pos) = t.b) AS mtch
                FROM e$i e CROSS JOIN top$i t),
       rr$i AS (SELECT *, CASE WHEN mtch THEN
                  pos - row_number() OVER (PARTITION BY word, mtch ORDER BY pos) END AS grp
                FROM mm$i),
       kk$i AS (SELECT *, coalesce(mtch AND
                  row_number() OVER (PARTITION BY word, grp ORDER BY pos) % 2 = 1,
                  false) AS keep
                FROM rr$i),
       t$i AS (SELECT word, any_value(freq) AS freq, list(newtok ORDER BY pos) AS toks
               FROM (SELECT word, freq, pos,
                            CASE WHEN keep THEN a || b ELSE tok END AS newtok
                     FROM (SELECT *, coalesce(lag(keep) OVER (PARTITION BY word
                             ORDER BY pos), false) AS prev_keep
                           FROM kk$i)
                     WHERE NOT prev_keep)
               GROUP BY word)"""
  }

  /** BPE tokenizer merge training ([[graft.operators.Bpe.trainMerges]],
    * 8 steps): the corpus compresses to the distinct-word frequency
    * table, then each step counts adjacent token pairs, picks the global
    * argmax, and greedily merges it everywhere. The oracle replays all
    * eight steps relationally — pair counts are exact integers and the
    * merge is a run-parity window, so the learned rules must agree
    * token for token.
    */
  val q136BpeTrain: QueryDef = QueryDef(
    "q136_bpe_train",
    (s, dir) => graft.operators.Bpe.trainMerges(Tables.documents(s, dir), steps = 8),
    Some(s"""WITH t0 AS (
              SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
                     string_split(w, '') AS toks
              FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              WHERE w != '' GROUP BY w),
            ${(1 to 8).map(bpeStepSql).mkString(",\n")}
            SELECT * FROM (
              ${(1 to 8)
                .map(i =>
                  s"SELECT $i AS step, a AS left_tok, b AS right_tok, f AS freq FROM top$i")
                .mkString(" UNION ALL ")}
            ) ORDER BY step""")
  )

  /** Count-min-sketch heavy hitters
    * ([[graft.operators.CountMin.heavyHitters]], d=4, w=256): unlike
    * q42's engine-private sketches, the md5-derived hash family makes
    * the COUNTER MATRIX itself engine-independent — the oracle rebuilds
    * the identical d×w sketch and the per-key min-over-rows estimates,
    * so the whole approximate structure is value-checked, not just
    * bounded. The ε-δ overshoot contract (est ≥ true) is pinned in
    * OperatorsSpec.
    */
  val q137CmsHeavy: QueryDef = QueryDef(
    "q137_cms_heavy",
    (s, dir) =>
      graft.operators.CountMin.heavyHitters(Tables.lineitem(s, dir), "l_partkey"),
    Some("""WITH ev AS (SELECT l_partkey AS k FROM lineitem),
            rws AS (SELECT k, j.j AS j FROM ev, range(0, 4) j(j)),
            counters AS (
              SELECT j,
                     CAST(('0x' || substring(md5(j || '|' || k), 1, 8)) AS BIGINT)
                       % 256 AS bucket,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM rws GROUP BY 1, 2),
            probes AS (
              SELECT k, CAST(count(*) AS BIGINT) AS true_cnt
              FROM ev GROUP BY k ORDER BY true_cnt DESC, k ASC LIMIT 10),
            ph AS (
              SELECT k, true_cnt, j.j AS j,
                     CAST(('0x' || substring(md5(j.j || '|' || k), 1, 8)) AS BIGINT)
                       % 256 AS bucket
              FROM probes, range(0, 4) j(j))
            SELECT ph.k AS l_partkey, any_value(true_cnt) AS true_cnt,
                   min(cnt) AS cms_est
            FROM ph JOIN counters USING (j, bucket) GROUP BY ph.k""")
  )

  /** Windowed co-occurrence + PMI ([[graft.operators.Cooccur.pmiPairs]],
    * window=2): scan-side pair generation (shifted-slice zips — no
    * position self-join), one pair-count shuffle, PMI arithmetic kept
    * textually parallel with the oracle so the doubles agree before
    * rounding.
    */
  val q138Pmi: QueryDef = QueryDef(
    "q138_pmi",
    (s, dir) => graft.operators.Cooccur.pmiPairs(Tables.documents(s, dir)),
    Some("""WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
            pr AS (
              SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b FROM (
                SELECT unnest([{'a': ts[i], 'b': ts[i + 1]}
                               FOR i IN range(1, len(ts))]) AS p FROM t
                UNION ALL
                SELECT unnest([{'a': ts[i], 'b': ts[i + 2]}
                               FOR i IN range(1, len(ts) - 1)]) AS p FROM t)
              WHERE p.a != '' AND p.b != ''),
            pc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                   FROM pr GROUP BY a, b),
            tokf AS (SELECT w FROM (SELECT unnest(ts) AS w FROM t) WHERE w != ''),
            uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w FROM tokf GROUP BY w),
            tot AS (SELECT (SELECT CAST(sum(c_ab) AS BIGINT) FROM pc) AS t_pairs,
                           (SELECT CAST(count(*) AS BIGINT) FROM tokf) AS n_toks)
            SELECT a, b, c_ab,
                   round(ln((CAST(c_ab AS DOUBLE) / t_pairs) /
                            ((CAST(ua.c_w AS DOUBLE) / n_toks) *
                             (CAST(ub.c_w AS DOUBLE) / n_toks))), 6) AS pmi
            FROM pc
            JOIN uni ua ON ua.w = a
            JOIN uni ub ON ub.w = b
            CROSS JOIN tot
            ORDER BY c_ab DESC, a ASC, b ASC LIMIT 20""")
  )

  /** Relational Bloom filter ([[graft.operators.Bloom.membershipSummary]],
    * m=4096, k=3): the BUILDING-segment customer keys become a distinct
    * set-bit table; every distinct ordering customer probes it. The md5
    * hash family makes the bit array engine-independent, so the oracle
    * rebuilds the filter and every verdict — including which probes are
    * FALSE POSITIVES, the part a bounds-only test can't check.
    */
  val q139Bloom: QueryDef = QueryDef(
    "q139_bloom",
    (s, dir) =>
      graft.operators.Bloom.membershipSummary(
        Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
        Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
        "c_custkey"),
    Some("""WITH bset AS (SELECT DISTINCT c_custkey AS bk FROM customer
                          WHERE c_mktsegment = 'BUILDING'),
            bits AS (SELECT DISTINCT
                       CAST(('0x' || substring(md5(j.j || '|' || bk), 1, 8)) AS BIGINT)
                         % 4096 AS pos
                     FROM bset, range(0, 3) j(j)),
            pk AS (SELECT DISTINCT o_custkey AS pk FROM orders),
            ph AS (SELECT pk, j.j AS j,
                          CAST(('0x' || substring(md5(j.j || '|' || pk), 1, 8)) AS BIGINT)
                            % 4096 AS pos
                   FROM pk, range(0, 3) j(j)),
            hits AS (SELECT pk, count(*) AS nhit FROM ph
                     WHERE pos IN (SELECT pos FROM bits) GROUP BY pk),
            verdicts AS (SELECT p.pk, coalesce(h.nhit, 0) = 3 AS maybe,
                                (p.pk IN (SELECT bk FROM bset)) AS member
                         FROM pk p LEFT JOIN hits h USING (pk))
            SELECT CAST(count(*) AS BIGINT) AS n_probes,
                   CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
                   CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
                   CAST(sum(CASE WHEN maybe AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_false_pos
            FROM verdicts""")
  )

  /** Temperature-weighted mixture sampling
    * ([[graft.operators.Sampling.temperatureSample]], α=0.5, frac=0.5
    * over `lang` domains): the data-mixture reweighting every LLM corpus
    * build runs — up-weight small domains, down-weight the head —
    * audited per domain. Deterministic identity-hash keeps; the one
    * float chain is textually parallel with the oracle.
    */
  val q140TempMixture: QueryDef = QueryDef(
    "q140_temp_mixture",
    (s, dir) =>
      graft.operators.Sampling
        .temperatureSample(Tables.documents(s, dir), "lang", "doc_id"),
    Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY lang),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                         sum(sqrt(CAST(n AS DOUBLE))) AS sumw FROM c),
            r AS (SELECT lang, n,
                         least(1000, CAST(floor(1000.0 * 0.5 * CAST(tot AS DOUBLE) *
                           sqrt(CAST(n AS DOUBLE)) /
                           (sumw * CAST(n AS DOUBLE))) AS BIGINT)) AS keep_pm
                  FROM c, t),
            k AS (SELECT d.lang, r.n, r.keep_pm,
                         CASE WHEN CAST(('0x' || substring(md5(
                                CAST(d.doc_id AS VARCHAR) || 't1'), 1, 8)) AS BIGINT)
                              % 1000 < r.keep_pm THEN 1 ELSE 0 END AS kept
                  FROM documents d JOIN r USING (lang))
            SELECT lang, any_value(n) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
                   any_value(keep_pm) AS rate_pm
            FROM k GROUP BY lang""")
  )

  /** Hard-negative mining
    * ([[graft.operators.Similarity.contrastivePairs]]): anchors are the
    * probe vectors; top-1 = positive, next 3 = hard negatives; margin =
    * pos − neg. The oracle replays q30's exact ranking and the pair
    * assembly.
    */
  val q141Contrastive: QueryDef = QueryDef(
    "q141_contrastive",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.contrastivePairs(emb, emb.filter(col("vec_id") < 10))
    },
    Some(s"""WITH pts AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            ranked AS (
              SELECT q.vec_id AS anchor_id, c.vec_id AS neighbor_id,
                     round(${AnnReplaySql.dot64("q.v", "c.v")} /
                           (sqrt(${AnnReplaySql.dot64("q.v", "q.v")}) *
                            sqrt(${AnnReplaySql.dot64("c.v", "c.v")})), 6) AS cosine,
                     row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       round(${AnnReplaySql.dot64("q.v", "c.v")} /
                             (sqrt(${AnnReplaySql.dot64("q.v", "q.v")}) *
                              sqrt(${AnnReplaySql.dot64("c.v", "c.v")})), 6) DESC,
                       c.vec_id ASC) AS rank
              FROM pts q JOIN pts c ON c.vec_id != q.vec_id
              WHERE q.vec_id < 10),
            pos AS (SELECT anchor_id, neighbor_id AS pos_id, cosine AS pos_cos
                    FROM ranked WHERE rank = 1),
            negs AS (SELECT anchor_id, neighbor_id AS neg_id, cosine AS neg_cos
                     FROM ranked WHERE rank > 1 AND rank <= 4)
            SELECT p.anchor_id, p.pos_id, n.neg_id, p.pos_cos, n.neg_cos,
                   round(p.pos_cos - n.neg_cos, 6) AS margin
            FROM pos p JOIN negs n USING (anchor_id)""")
  )

  /** Exact triangle counting ([[graft.operators.Graph.triangleCounts]])
    * over the word co-occurrence graph (the top-60 q138 pairs as edges):
    * the id-oriented two-join formulation counts each triangle once and
    * caps join fan-out by orientation — the standard skew control. The
    * oracle replays edge derivation + both joins + the corner explode.
    */
  val q142Triangles: QueryDef = QueryDef(
    "q142_triangles",
    (s, dir) => {
      val edges = graft.operators.Cooccur
        .pmiPairs(Tables.documents(s, dir), window = 2, topK = 60)
        .select(col("a").as("src"), col("b").as("dst"))
      graft.operators.Graph.triangleCounts(edges)
    },
    Some("""WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
            pr AS (
              SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b FROM (
                SELECT unnest([{'a': ts[i], 'b': ts[i + 1]}
                               FOR i IN range(1, len(ts))]) AS p FROM t
                UNION ALL
                SELECT unnest([{'a': ts[i], 'b': ts[i + 2]}
                               FOR i IN range(1, len(ts) - 1)]) AS p FROM t)
              WHERE p.a != '' AND p.b != ''),
            e AS (SELECT a AS lo, b AS hi FROM (
                    SELECT a, b, count(*) AS c_ab FROM pr GROUP BY a, b
                    ORDER BY c_ab DESC, a ASC, b ASC LIMIT 60)
                  WHERE a != b),
            tri AS (
              SELECT w.a, w.b, w.c
              FROM (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
                    FROM e e1 JOIN e e2 ON e2.lo = e1.hi) w
              JOIN e e3 ON e3.lo = w.a AND e3.hi = w.c),
            corners AS (
              SELECT a AS node FROM tri UNION ALL
              SELECT b FROM tri UNION ALL
              SELECT c FROM tri)
            SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY node""")
  )

  /** Grouped winsorization — robust-stats outlier capping: per event
    * type, `value` clamps to the exact [p05, p95] quantiles
    * (percentile ≡ quantile_cont linear interpolation, the q3 parity),
    * reported as caps + pre/post means. One aggregate for the caps,
    * broadcast back, row-local clamp — no second shuffle of the events.
    */
  val q143Winsorize: QueryDef = QueryDef(
    "q143_winsorize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val caps = ev
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
      // hint-free: per-event-type caps are group-keyed; AQE decides
      ev.join(caps, "event_type")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("value")), 6).as("mean_raw"),
          round(avg(least(greatest(col("value"), col("p05")), col("p95"))), 6)
            .as("mean_wins"),
          round(first(col("p05")), 6).as("p05"),
          round(first(col("p95")), 6).as("p95"))
    },
    Some("""WITH caps AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS p05,
                     quantile_cont(value, 0.95) AS p95
              FROM events GROUP BY event_type)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(value), 6) AS mean_raw,
                   round(avg(least(greatest(value, c.p05), c.p95)), 6) AS mean_wins,
                   round(any_value(c.p05), 6) AS p05,
                   round(any_value(c.p95), 6) AS p95
            FROM events e JOIN caps c USING (event_type)
            GROUP BY e.event_type""")
  )

  /** BPE ENCODE ([[graft.operators.Bpe.encode]]): the learned merges
    * applied — the per-word final token sequences (the broadcastable
    * vocabulary of a 100 TB encode job), md5-pinned token for token.
    * The oracle replays training AND encoding: its final token state t8
    * must agree with the engine's, not just the rules.
    */
  val q144BpeEncode: QueryDef = QueryDef(
    "q144_bpe_encode",
    (s, dir) => graft.operators.Bpe.encode(Tables.documents(s, dir), steps = 8),
    Some(s"""WITH t0 AS (
              SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
                     string_split(w, '') AS toks
              FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              WHERE w != '' GROUP BY w),
            ${(1 to 8).map(bpeStepSql).mkString(",\n")}
            SELECT word, freq, CAST(len(toks) AS INT) AS n_toks,
                   md5(array_to_string(toks, '|')) AS toks_md5
            FROM t8""")
  )

  /** Exact repeated-span detection
    * ([[graft.operators.Dedup.repeatedSpans]], w=8): positional
    * span-level exact dedup — maximal runs of cross-document-repeated
    * shingles via the gaps-and-islands window. The oracle replays
    * shingling, the repetition aggregate, island grouping and the span
    * arithmetic.
    */
  val q145RepeatedSpans: QueryDef = QueryDef(
    "q145_repeated_spans",
    (s, dir) => graft.operators.Dedup.repeatedSpans(Tables.documents(s, dir)),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            sh AS (SELECT doc_id, pr.pos AS pos, pr.sig AS sig FROM (
                     SELECT doc_id,
                            unnest([{'pos': i, 'sig': md5(array_to_string(
                                      ts[i + 1 : i + 8], ' '))}
                                    FOR i IN range(0, len(ts) - 7)]) AS pr
                     FROM t WHERE len(ts) >= 8)),
            rep AS (SELECT sig FROM sh GROUP BY sig
                    HAVING count(DISTINCT doc_id) >= 2),
            isl AS (SELECT doc_id, pos,
                           pos - row_number() OVER (PARTITION BY doc_id
                             ORDER BY pos) AS island
                    FROM sh WHERE sig IN (SELECT sig FROM rep)),
            runs AS (SELECT doc_id, island, CAST(count(*) AS BIGINT) AS run
                     FROM isl GROUP BY doc_id, island)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(run + 7) AS BIGINT) AS repeated_tokens,
                   CAST(max(run) + 7 AS BIGINT) AS max_span_tokens
            FROM runs GROUP BY doc_id""")
  )

  /** Exact-size deterministic sample
    * ([[graft.operators.Sampling.exactSample]], n=100): order-statistics
    * on md5 priorities — exactly n rows, reproducible, engine-independent,
    * planned as a partial top-n (no global sort; the plan audit pins
    * TakeOrderedAndProject).
    */
  val q146ExactSample: QueryDef = QueryDef(
    "q146_exact_sample",
    (s, dir) =>
      graft.operators.Sampling
        .exactSample(Tables.documents(s, dir), "doc_id", n = 100)
        .select(col("doc_id"), col("lang"), col("source")),
    Some("""SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'x1'),
                                             1, 15)) AS BIGINT) AS pri
              FROM documents
              ORDER BY pri ASC, doc_id ASC LIMIT 100)""")
  )

  /** Relational HyperLogLog ([[graft.operators.Hll.distinctSketch]],
    * m=512): md5-derived register indices and exact integer ρ
    * (`33 − length(bin(w))`), so the oracle reconstructs the IDENTICAL
    * register array — including the linear-counting small-range branch,
    * which fires at sf0.001 and hands over to the raw harmonic estimate
    * at sf0.01 (both paths exercised across the verify SFs).
    */
  val q147Hll: QueryDef = QueryDef(
    "q147_hll_distinct",
    (s, dir) =>
      graft.operators.Hll
        .distinctSketch(Tables.lineitem(s, dir), "l_returnflag", "l_orderkey"),
    Some("""WITH dk AS (SELECT DISTINCT l_returnflag AS flag, l_orderkey AS k
                        FROM lineitem),
            h AS (SELECT flag,
                    CAST(('0x'||substring(md5(CAST(k AS VARCHAR)),1,8)) AS BIGINT) % 512 AS bucket,
                    CAST(('0x'||substring(md5(CAST(k AS VARCHAR)),9,8)) AS BIGINT) AS w
                  FROM dk),
            r AS (SELECT flag, bucket,
                    max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS mj,
                    count(*) AS nk
                  FROM h GROUP BY flag, bucket),
            s AS (SELECT flag, CAST(sum(nk) AS BIGINT) AS exact_distinct,
                    count(*) AS np, sum(power(2.0, -mj)) AS sp
                  FROM r GROUP BY flag)
            SELECT flag AS l_returnflag, exact_distinct,
              round(CASE WHEN (0.7213/(1+1.079/512))*512*512/(sp + (512-np)) <= 2.5*512
                          AND np < 512
                THEN 512 * ln(512.0/(512-np))
                ELSE (0.7213/(1+1.079/512))*512*512/(sp + (512-np)) END, 6) AS hll_est,
              CAST(512 - np AS INT) AS v_zero
            FROM s""")
  )

  /** Weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSample]], Efraimidis–Spirtakis
    * A-ES): md5-derived uniforms, key `−ln(u)/w`, top-200 by key — an
    * exact-size weighted draw that plans as a partial top-n. The oracle
    * replays the key arithmetic bit-for-bit (dyadic u, same association
    * order).
    */
  val q148WeightedSample: QueryDef = QueryDef(
    "q148_weighted_sample",
    (s, dir) =>
      graft.operators.Sampling
        .weightedSample(Tables.orders(s, dir), "o_orderkey", "o_totalprice", n = 200)
        .select(col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice,
                -ln((CAST(('0x'||substring(md5(CAST(o_orderkey AS VARCHAR) || 'w1'),1,12)) AS BIGINT) + 0.5)
                    / 281474976710656.0) / o_totalprice AS k
              FROM orders WHERE o_totalprice > 0
              ORDER BY k ASC, o_orderkey ASC LIMIT 200)""")
  )

  /** Distribution drift ([[graft.operators.Drift.ksVsRest]]): exact
    * two-sample Kolmogorov–Smirnov statistic of every source's n_chars
    * distribution against the rest of the corpus — ECDFs as window
    * cumsums over the zero-filled (source × value) histogram grid, no
    * sort-collect anywhere.
    */
  val q149KsDrift: QueryDef = QueryDef(
    "q149_ks_drift",
    (s, dir) =>
      graft.operators.Drift.ksVsRest(Tables.documents(s, dir), "source", "n_chars"),
    Some("""WITH counts AS (SELECT source, n_chars AS v, count(*) AS c
                            FROM documents GROUP BY 1, 2),
            g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_g FROM counts GROUP BY 1),
            vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS c_all FROM counts GROUP BY 1),
            tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all FROM vals),
            grid AS (SELECT g.source, g.n_g, t.n_all, vals.v, vals.c_all,
                            coalesce(c.c, 0) AS c
                     FROM g CROSS JOIN tot t CROSS JOIN vals
                     LEFT JOIN counts c ON c.source = g.source AND c.v = vals.v),
            cum AS (SELECT source, n_g, n_all, c_all,
                      sum(c) OVER (PARTITION BY source ORDER BY v) AS cum_g,
                      sum(c_all) OVER (PARTITION BY source ORDER BY v) AS cum_all
                    FROM grid)
            SELECT source, n_g AS n,
                   round(max(abs(cum_g / n_g - (cum_all - cum_g) / (n_all - n_g))), 6)
                     AS ks_vs_rest
            FROM cum GROUP BY source, n_g""")
  )

  /** Robust outliers ([[graft.operators.Drift.madOutliers]]): per
    * event_type exact median + MAD over `value`, rows beyond 3 robust
    * sigmas counted (conditional sum, so clean groups report 0 — the
    * events table has a genuine tail, so counts are nonzero at every SF).
    */
  val q150MadOutliers: QueryDef = QueryDef(
    "q150_mad_outliers",
    (s, dir) =>
      graft.operators.Drift.madOutliers(Tables.events(s, dir), "event_type", "value"),
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                         FROM events GROUP BY 1),
            a AS (SELECT d.event_type, abs(CAST(d.value AS DOUBLE) - m.med) AS adev,
                         m.med AS med
                  FROM events d JOIN med m USING (event_type)),
            st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, min(med) AS med,
                          quantile_cont(adev, 0.5) AS mad
                   FROM a GROUP BY 1)
            SELECT a.event_type, min(st.n) AS n, round(min(st.med), 6) AS med,
                   round(min(st.mad), 6) AS mad,
                   CAST(sum(CASE WHEN a.adev > 3.0 * 1.4826 * st.mad THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers
            FROM a JOIN st USING (event_type) GROUP BY a.event_type""")
  )

  private val cooccurEdgeSql =
    """t AS (SELECT string_split(text, ' ') AS ts FROM documents),
            pr AS (
              SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b FROM (
                SELECT unnest([{'a': ts[i], 'b': ts[i + 1]}
                               FOR i IN range(1, len(ts))]) AS p FROM t
                UNION ALL
                SELECT unnest([{'a': ts[i], 'b': ts[i + 2]}
                               FOR i IN range(1, len(ts) - 1)]) AS p FROM t)
              WHERE p.a != '' AND p.b != ''),
            e AS (SELECT a AS lo, b AS hi FROM (
                    SELECT a, b, count(*) AS c_ab FROM pr GROUP BY a, b
                    ORDER BY c_ab DESC, a ASC, b ASC LIMIT 60)
                  WHERE a != b),
            adj AS (SELECT lo AS node, hi AS nbr FROM e
                    UNION SELECT hi AS node, lo AS nbr FROM e)"""

  private def lpaRoundSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT node, label FROM (
            SELECT a.node, l.label, count(*) AS c, row_number() OVER (
              PARTITION BY a.node ORDER BY count(*) DESC, l.label ASC) AS rn
            FROM adj a JOIN $prev l ON l.node = a.nbr
            GROUP BY a.node, l.label) WHERE rn = 1)"""

  /** Label-propagation communities
    * ([[graft.operators.Graph.labelPropagation]], 3 rounds) over the
    * word co-occurrence graph (q142's edge set): deterministic LPA —
    * most-frequent neighbor label, smallest-label tie-break — so the
    * oracle unrolls the identical three argmax rounds.
    */
  val q151LabelProp: QueryDef = QueryDef(
    "q151_label_prop",
    (s, dir) => {
      val edges = graft.operators.Cooccur
        .pmiPairs(Tables.documents(s, dir), window = 2, topK = 60)
        .select(col("a").as("src"), col("b").as("dst"))
      graft.operators.Graph.labelPropagation(edges, iters = 3)
    },
    Some(s"""WITH $cooccurEdgeSql,
            l0 AS (SELECT DISTINCT node, node AS label FROM adj),
            ${lpaRoundSql("l0", "l1")},
            ${lpaRoundSql("l1", "l2")},
            ${lpaRoundSql("l2", "l3")}
            SELECT label, CAST(count(*) AS BIGINT) AS size, min(node) AS min_node
            FROM l3 GROUP BY label""")
  )

  /** Neighborhood Jaccard link prediction
    * ([[graft.operators.Graph.nodeJaccard]], top-20) over the same
    * graph: wedge self-join for common neighbors, union by
    * deg(a)+deg(b)−common — the relational common-neighbors score.
    */
  val q152NodeJaccard: QueryDef = QueryDef(
    "q152_node_jaccard",
    (s, dir) => {
      val edges = graft.operators.Cooccur
        .pmiPairs(Tables.documents(s, dir), window = 2, topK = 60)
        .select(col("a").as("src"), col("b").as("dst"))
      graft.operators.Graph.nodeJaccard(edges, topK = 20)
    },
    Some(s"""WITH $cooccurEdgeSql,
            deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
            cmn AS (SELECT x.node AS node_a, y.node AS node_b, count(*) AS common
                    FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
                    GROUP BY 1, 2)
            SELECT node_a, node_b, CAST(common AS BIGINT) AS common,
                   round(common / (da.deg + db.deg - common), 6) AS jaccard
            FROM cmn
            JOIN deg da ON da.node = cmn.node_a
            JOIN deg db ON db.node = cmn.node_b
            ORDER BY jaccard DESC, node_a ASC, node_b ASC LIMIT 20""")
  )

  /** Hybrid-retrieval fusion ([[graft.operators.Retrieval.rrfFuse]]):
    * reciprocal-rank fusion of the BM25 lexical top-100 (q129's scoring)
    * with the dense cosine top-100 for query vector 0 (q30's ranking) —
    * the sparse+dense hybrid every RAG stack ships. Both input rankings
    * order by the ROUNDED score with id tie-break (the q30 discipline),
    * so ranks — and therefore the fused scores — are engine-exact.
    */
  val q153RrfFusion: QueryDef = QueryDef(
    "q153_rrf_fusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sparse = graft.operators.TextAnalysis
        .bm25Scores(Tables.documents(s, dir), Seq("data", "query", "stream"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(100)
        .withColumn(
          "rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val dense = graft.operators.Similarity
        .bruteTopK(emb, emb.filter(col("vec_id") === 0), k = 100)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(sparse, dense), "doc_id")
    },
    Some(s"""WITH tok AS (
              SELECT doc_id, t FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE t <> ''),
            dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
            c AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
            q AS (SELECT doc_id, t, count(*) AS tf FROM tok
                  WHERE t IN ('data', 'query', 'stream') GROUP BY 1, 2),
            idf AS (SELECT t, count(DISTINCT doc_id) AS dfc FROM tok
                    WHERE t IN ('data', 'query', 'stream') GROUP BY t),
            scored AS (
              SELECT q.doc_id,
                     ln((c.n_docs - idf.dfc + 0.5) / (idf.dfc + 0.5) + 1.0)
                       * q.tf * (1.2 + 1.0)
                       / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / c.avgdl)) AS ts
              FROM q JOIN idf USING (t) JOIN dl USING (doc_id), c),
            sp AS (SELECT doc_id, rank FROM (
                     SELECT doc_id, row_number() OVER (
                       ORDER BY bm25 DESC, doc_id ASC) AS rank
                     FROM (SELECT doc_id, round(sum(ts), 6) AS bm25
                           FROM scored GROUP BY doc_id))
                   WHERE rank <= 100),
            dn AS (SELECT doc_id, rank FROM (
                     SELECT cv.vec_id AS doc_id, row_number() OVER (
                       ORDER BY round(${LlmQueries.dotSql("qv.embedding", "cv.embedding")} /
                                      (sqrt(${LlmQueries.dotSql("qv.embedding", "qv.embedding")}) *
                                       sqrt(${LlmQueries.dotSql("cv.embedding", "cv.embedding")})), 6)
                         DESC, cv.vec_id ASC) AS rank
                     FROM embeddings qv JOIN embeddings cv ON cv.vec_id != qv.vec_id
                     WHERE qv.vec_id = 0)
                   WHERE rank <= 100),
            u AS (SELECT doc_id, rank FROM sp UNION ALL SELECT doc_id, rank FROM dn)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
                   round(sum(1.0 / (60 + rank)), 6) AS rrf
            FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id ASC LIMIT 20""")
  )

  /** DDSketch quantiles ([[graft.operators.DdSketch.quantiles]], α=2%):
    * the relative-error quantile sketch as a bin-count aggregate —
    * mergeable by adding bin counts, O(#bins) space at any scale. The
    * oracle rebuilds the identical bin array, cumsum and rank selection;
    * exact percentiles ride along as comparison columns.
    */
  val q154DdSketch: QueryDef = QueryDef(
    "q154_ddsketch",
    (s, dir) =>
      graft.operators.DdSketch.quantiles(Tables.events(s, dir), "event_type", "value"),
    Some("""WITH v AS (SELECT event_type, value FROM events WHERE value > 0),
            b AS (SELECT event_type,
                         CAST(ceil(ln(value) / ln(1.02 / 0.98)) AS BIGINT) AS i
                  FROM v),
            c AS (SELECT event_type, i, count(*) AS cnt FROM b GROUP BY 1, 2),
            cum AS (SELECT event_type, i,
                      sum(cnt) OVER (PARTITION BY event_type ORDER BY i) AS cum,
                      sum(cnt) OVER (PARTITION BY event_type) AS n
                    FROM c),
            sel AS (SELECT event_type, CAST(min(n) AS BIGINT) AS n,
                      min(CASE WHEN cum >= floor(0.5 * (n - 1)) + 1 THEN i END) AS i50,
                      min(CASE WHEN cum >= floor(0.95 * (n - 1)) + 1 THEN i END) AS i95,
                      min(CASE WHEN cum >= floor(0.99 * (n - 1)) + 1 THEN i END) AS i99
                    FROM cum GROUP BY event_type),
            ex AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact,
                          round(quantile_cont(value, 0.95), 6) AS p95_exact,
                          round(quantile_cont(value, 0.99), 6) AS p99_exact
                   FROM v GROUP BY 1)
            SELECT s.event_type, s.n,
              round(2 * power(1.02 / 0.98, i50) / (1.02 / 0.98 + 1), 6) AS p50_est,
              round(2 * power(1.02 / 0.98, i95) / (1.02 / 0.98 + 1), 6) AS p95_est,
              round(2 * power(1.02 / 0.98, i99) / (1.02 / 0.98 + 1), 6) AS p99_est,
              ex.p50_exact, ex.p95_exact, ex.p99_exact
            FROM sel s JOIN ex USING (event_type)""")
  )

  /** Interpolated bigram LM scoring
    * ([[graft.operators.TextAnalysis.bigramLogProb]], λ=0.7): per-doc
    * mean ln(λ·P(w₂|w₁) + (1−λ)·P(w₂)) with corpus MLE probabilities —
    * the q126 perplexity filter upgraded to conditional structure.
    */
  val q155BigramLm: QueryDef = QueryDef(
    "q155_bigram_lm",
    (s, dir) =>
      graft.operators.TextAnalysis.bigramLogProb(Tables.documents(s, dir)),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            bg0 AS (SELECT doc_id,
                           unnest([{'a': ts[i], 'b': ts[i + 1]}
                                   FOR i IN range(1, len(ts))]) AS p
                    FROM t),
            bg AS (SELECT doc_id, p.a AS w1, p.b AS w2 FROM bg0
                   WHERE p.a != '' AND p.b != ''),
            cb AS (SELECT w1, w2, count(*) AS c_b FROM bg GROUP BY 1, 2),
            cl AS (SELECT w1, count(*) AS c_l FROM bg GROUP BY 1),
            tok AS (SELECT t FROM (
                      SELECT unnest(string_split(text, ' ')) AS t FROM documents)
                    WHERE t <> ''),
            tot AS (SELECT count(*) AS total FROM tok),
            cu AS (SELECT t AS w2, count(*) AS c_u FROM tok GROUP BY 1)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(ln(0.7 * (c_b / c_l) + 0.3 * (c_u / total))), 6) AS mean_ll
            FROM bg JOIN cb USING (w1, w2) JOIN cl USING (w1) JOIN cu USING (w2), tot
            GROUP BY doc_id""")
  )

  /** Character entropy ([[graft.operators.TextAnalysis.charEntropy]]):
    * −Σ p·ln p per document over its character distribution — the
    * natural-text quality gate (low = key-mash/repetition, high =
    * random bytes).
    */
  val q156CharEntropy: QueryDef = QueryDef(
    "q156_char_entropy",
    (s, dir) =>
      graft.operators.TextAnalysis.charEntropy(Tables.documents(s, dir)),
    Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                        FROM documents),
            c AS (SELECT doc_id, ch, count(*) AS c FROM ch
                  WHERE ch <> '' GROUP BY 1, 2),
            w AS (SELECT doc_id, c,
                    sum(c) OVER (PARTITION BY doc_id) AS len
                  FROM c)
            SELECT doc_id, CAST(min(len) AS BIGINT) AS n_chars_counted,
                   round(-sum((c / len) * ln(c / len)), 6) AS entropy
            FROM w GROUP BY doc_id""")
  )

  /** Semantic decontamination
    * ([[graft.operators.Similarity.semanticContamination]]): corpus
    * vectors (vec_id ≥ 20) too close to any eval vector (vec_id < 20) in
    * embedding space — md5-SRP bucket candidates, exact cosine, worst
    * hit per doc. The oracle replays plane generation, signatures, the
    * cross-set bucket join and the argmax.
    */
  val q157SemanticDecontam: QueryDef = QueryDef(
    "q157_semantic_decontam",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Similarity.semanticContamination(
        emb.filter(col("vec_id") >= 20),
        emb.filter(col("vec_id") < 20))
    },
    Some(s"""WITH planes AS (
              SELECT t.t AS t, p.p AS p, k.k AS k,
                     (CAST(('0x' || substring(md5('srp|' || t.t || '|' || p.p || '|' || k.k),
                                              1, 12)) AS BIGINT)
                      - 140737488355328) / 140737488355328.0 AS w
              FROM range(0, 6) t(t), range(0, 4) p(p), range(0, 64) k(k)),
            dims AS (
              SELECT vec_id, k.k AS k, CAST(embedding[k.k + 1] AS DOUBLE) AS x
              FROM embeddings, range(0, 64) k(k)
              WHERE k.k < len(embedding)),
            dots AS (
              SELECT d.vec_id, pl.t, pl.p, sum(d.x * pl.w) AS dot
              FROM dims d JOIN planes pl ON pl.k = d.k
              GROUP BY 1, 2, 3),
            sigs AS (
              SELECT vec_id, t,
                     CAST(sum(CASE WHEN dot >= 0 THEN 1 << CAST(p AS INT)
                              ELSE 0 END) AS INT) AS sig
              FROM dots GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT c.vec_id AS doc_id, e.vec_id AS eval_id
              FROM sigs c JOIN sigs e ON c.t = e.t AND c.sig = e.sig
              WHERE c.vec_id >= 20 AND e.vec_id < 20),
            scored AS (
              SELECT cand.doc_id, cand.eval_id,
                     round(${LlmQueries.dotSql("a.embedding", "b.embedding")} /
                           (sqrt(${LlmQueries.dotSql("a.embedding", "a.embedding")}) *
                            sqrt(${LlmQueries.dotSql("b.embedding", "b.embedding")})), 6) AS cosine
              FROM cand
              JOIN embeddings a ON a.vec_id = cand.doc_id
              JOIN embeddings b ON b.vec_id = cand.eval_id
              WHERE a.vec_id >= 20 AND b.vec_id < 20)
            SELECT doc_id, eval_id, cosine FROM (
              SELECT doc_id, eval_id, cosine, row_number() OVER (
                PARTITION BY doc_id ORDER BY cosine DESC, eval_id ASC) AS rn
              FROM scored WHERE cosine >= 0.30) WHERE rn = 1""")
  )

  /** Trigram-index substring search
    * ([[graft.operators.TrigramIndex.substringSearch]]): the inverted
    * trigram index that turns `LIKE '%batch stream%'` into an index
    * lookup — candidates via the all-trigrams counting gate, exact
    * contains on candidates only; false positives emitted as evidence of
    * index selectivity.
    */
  val q158TrigramSearch: QueryDef = QueryDef(
    "q158_trigram_search",
    (s, dir) =>
      graft.operators.TrigramIndex
        .substringSearch(Tables.documents(s, dir), "batch stream"),
    Some("""WITH pats AS (SELECT DISTINCT substring('batch stream', CAST(i AS INT) + 1, 3) AS tg
                          FROM range(0, 10) r(i)),
            np AS (SELECT count(*) AS np FROM pats),
            dt AS (SELECT DISTINCT doc_id,
                          unnest([substring(text, i + 1, 3)
                                  FOR i IN range(0, len(text) - 2)]) AS tg
                   FROM documents WHERE len(text) >= 3),
            cand AS (SELECT doc_id, count(*) AS nh
                     FROM dt JOIN pats USING (tg) GROUP BY 1)
            SELECT c.doc_id, contains(d.text, 'batch stream') AS confirmed
            FROM cand c, np JOIN documents d ON d.doc_id = c.doc_id
            WHERE c.nh = np.np""")
  )

  /** Equi-depth binning ([[graft.operators.Binning.equiDepth]], 10
    * bins): exact decile boundaries from one aggregate, broadcast,
    * row-local strict-> assignment — discretization with no global sort.
    */
  val q159EquiDepth: QueryDef = QueryDef(
    "q159_equidepth_bins",
    (s, dir) =>
      graft.operators.Binning.equiDepth(Tables.orders(s, dir), "o_totalprice"),
    Some(s"""WITH b AS (SELECT [${(1 until 10)
               .map(i => s"quantile_cont(o_totalprice, 0.$i)")
               .mkString(", ")}] AS bs FROM orders),
            a AS (SELECT o_totalprice AS v,
                         len(list_filter(b.bs, x -> o_totalprice > x)) AS bin
                  FROM orders, b)
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   round(min(v), 6) AS lo, round(max(v), 6) AS hi
            FROM a GROUP BY bin""")
  )

  /** Batch sessionization + first-touch attribution
    * ([[graft.operators.Sessionize.firstTouchAttribution]], 30-min gap):
    * gaps-and-islands sessions, session attributed to its first event
    * type, conversion = contains a purchase. One user-keyed shuffle.
    */
  val q160Attribution: QueryDef = QueryDef(
    "q160_attribution",
    (s, dir) =>
      graft.operators.Sessionize.firstTouchAttribution(Tables.events(s, dir)),
    Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
                       FROM events),
            g AS (SELECT *, CASE WHEN lag(us) OVER (
                              PARTITION BY user_id ORDER BY us, event_id) IS NULL
                            OR us - lag(us) OVER (
                              PARTITION BY user_id ORDER BY us, event_id) > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e),
            s AS (SELECT *, sum(brk) OVER (
                    PARTITION BY user_id ORDER BY us, event_id) AS sess FROM g),
            s2 AS (SELECT *, first_value(event_type) OVER (
                     PARTITION BY user_id, sess ORDER BY us, event_id) AS first_type
                   FROM s),
            fs AS (SELECT user_id, sess, min(first_type) AS first_type,
                     max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchased
                   FROM s2 GROUP BY 1, 2)
            SELECT first_type, CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(purchased) AS BIGINT) AS n_converted,
                   round(sum(purchased) / count(*), 6) AS cvr
            FROM fs GROUP BY 1""")
  )

  /** Streaming HyperLogLog
    * ([[graft.streaming.StreamingOps.runStreamingHll]]): distinct-user
    * registers per event type as ONE stateful streaming aggregation
    * (max(ρ) is multiset-invariant — no distinct, m rows of state per
    * group forever), estimate at read time. End state ≡ batch, so the
    * batch register replay is the oracle.
    */
  val q161StreamHll: QueryDef = QueryDef(
    "q161_stream_hll",
    (s, dir) => graft.streaming.StreamingOps.runStreamingHll(s, dir),
    Some("""WITH h AS (SELECT event_type,
                    CAST(('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) % 512 AS bucket,
                    CAST(('0x'||substring(md5(CAST(user_id AS VARCHAR)),9,8)) AS BIGINT) AS w
                  FROM events),
            r AS (SELECT event_type, bucket,
                    max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS mj
                  FROM h GROUP BY 1, 2),
            s AS (SELECT event_type, count(*) AS np, sum(power(2.0, -mj)) AS sp
                  FROM r GROUP BY 1)
            SELECT event_type,
              round(CASE WHEN (0.7213/(1+1.079/512))*512*512/(sp + (512-np)) <= 2.5*512
                          AND np < 512
                THEN 512 * ln(512.0/(512-np))
                ELSE (0.7213/(1+1.079/512))*512*512/(sp + (512-np)) END, 6) AS hll_est,
              CAST(512 - np AS INT) AS v_zero
            FROM s""")
  )

  /** Sqrt-smoothed source capping
    * ([[graft.operators.Sampling.sqrtSourceCap]]): head-domain
    * suppression — per-source keep cap `max(10, ⌈4·√n_s⌉)`, quality-first
    * retention (n_chars desc), one source-keyed shuffle (cap derived
    * inside the window pass, summary map-side).
    */
  val q162SourceCap: QueryDef = QueryDef(
    "q162_source_cap",
    (s, dir) => graft.operators.Sampling.sqrtSourceCap(Tables.documents(s, dir)),
    Some("""WITH r AS (SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n_docs
               FROM documents),
            r2 AS (SELECT *, greatest(10, CAST(ceil(4.0 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)) AS cap FROM r)
            SELECT source, CAST(min(n_docs) AS BIGINT) AS n_docs, CAST(min(cap) AS BIGINT) AS cap,
               CAST(sum(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_total,
               CAST(sum(CASE WHEN rn <= cap THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
               round(sum(CASE WHEN rn <= cap THEN n_chars ELSE 0 END) / sum(n_chars), 6) AS kept_frac
            FROM r2 GROUP BY source""")
  )

  /** Streaming count-min
    * ([[graft.streaming.StreamingOps.runStreamingCms]]): the d×w counter
    * matrix as ONE stateful streaming aggregation (counters are sums —
    * per-event increments ≡ the batch matrix, d·w rows of state
    * forever), probed at read time for user_id < 10 with exact counts
    * alongside. End state ≡ batch, so the batch counter replay is the
    * oracle.
    */
  val q163StreamCms: QueryDef = QueryDef(
    "q163_stream_cms",
    (s, dir) => graft.streaming.StreamingOps.runStreamingCms(s, dir),
    Some("""WITH ev AS (SELECT user_id AS k FROM events),
            rws AS (SELECT k, j.j AS j FROM ev, range(0, 4) j(j)),
            counters AS (
              SELECT j,
                     CAST(('0x' || substring(md5(j || '|' || k), 1, 8)) AS BIGINT)
                       % 256 AS bucket,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM rws GROUP BY 1, 2),
            probes AS (
              SELECT k, CAST(count(*) AS BIGINT) AS true_cnt
              FROM ev WHERE k < 10 GROUP BY k),
            ph AS (
              SELECT k, true_cnt, j.j AS j,
                     CAST(('0x' || substring(md5(j.j || '|' || k), 1, 8)) AS BIGINT)
                       % 256 AS bucket
              FROM probes, range(0, 4) j(j))
            SELECT ph.k AS user_id, any_value(true_cnt) AS true_cnt,
                   min(cnt) AS cms_est
            FROM ph JOIN counters USING (j, bucket) GROUP BY ph.k""")
  )

  /** KMV set-intersection sketch
    * ([[graft.operators.Kmv.pairIntersections]], k=64): the
    * set-OPERATIONS cardinality sketch — per priority-pair customer-set
    * size, union, Jaccard and intersection estimates from k-min md5
    * hash values, with the exact intersection riding along as the
    * sample-scale verification. The oracle rebuilds the identical
    * sketches, merged k-mins, memberships and estimator arithmetic.
    */
  val q164KmvIntersect: QueryDef = QueryDef(
    "q164_kmv_intersect",
    (s, dir) =>
      graft.operators.Kmv.pairIntersections(
        Tables.orders(s, dir), "o_orderpriority", "o_custkey"),
    Some("""WITH dh AS (SELECT DISTINCT o_orderpriority AS s,
              CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
            FROM orders),
            sk AS (SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM dh
                   QUALIFY rn <= 64),
            est AS (SELECT s, CAST(count(*) AS BIGINT) AS n_sk,
                       CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                            ELSE 63 / (max(h) / 1152921504606846976.0) END AS est_s
                    FROM sk GROUP BY s),
            pairs AS (SELECT a.s AS sa, b.s AS sb FROM est a, est b WHERE a.s < b.s),
            mg0 AS (SELECT DISTINCT p.sa, p.sb, k.h FROM pairs p
                    JOIN sk k ON k.s = p.sa OR k.s = p.sb),
            mg AS (SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
                   FROM mg0 QUALIFY rn <= 64),
            un AS (SELECT mg.sa, mg.sb, CAST(count(*) AS BIGINT) AS k_used, max(mg.h) AS h_k,
                      CAST(sum(CASE WHEN x.h IS NOT NULL AND y.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
                   FROM mg
                   LEFT JOIN sk x ON x.s = mg.sa AND x.h = mg.h
                   LEFT JOIN sk y ON y.s = mg.sb AND y.h = mg.h
                   GROUP BY mg.sa, mg.sb),
            ex AS (SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS exact_inter
                   FROM dh a JOIN dh b ON a.h = b.h AND a.s < b.s GROUP BY 1, 2)
            SELECT un.sa AS set_a, un.sb AS set_b,
               round(ea.est_s, 6) AS est_a, round(eb.est_s, 6) AS est_b,
               round(CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                          ELSE 63 / (h_k / 1152921504606846976.0) END, 6) AS est_union,
               n_both,
               round(CAST(n_both AS DOUBLE) / k_used, 6) AS jaccard_est,
               round((CAST(n_both AS DOUBLE) / k_used) *
                     (CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                           ELSE 63 / (h_k / 1152921504606846976.0) END), 6) AS est_inter,
               coalesce(ex.exact_inter, 0) AS exact_inter
            FROM un JOIN est ea ON ea.s = un.sa JOIN est eb ON eb.s = un.sb
            LEFT JOIN ex ON ex.sa = un.sa AND ex.sb = un.sb""")
  )

  /** Merge-on-read deletion vectors
    * ([[graft.sources.LakeDeletes]]): two predicate deletes write
    * position sidecars (no data-file rewrite), the read anti-joins them
    * out; per-flag totals/live/deleted prove the DV accumulation. The
    * oracle is the plain relational filter — the physical delete
    * mechanism must be invisible in the result.
    */
  val q165DeletionVectors: QueryDef = QueryDef(
    "q165_deletion_vectors",
    (s, dir) => {
      import graft.sources.{LakeDeletes, LakeLog}
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_discount"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_q165").resolve("lineitem_mor").toString
      LakeLog.overwrite(li.repartition(4), path)
      LakeDeletes.deleteWhere(s, path, col("l_quantity") > 45)
      LakeDeletes.deleteWhere(s, path, col("l_discount") > 0.08)
      val totals = LakeLog.read(s, path)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_total"))
      val live = LakeDeletes.readLive(s, path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_live"), round(sum(col("l_quantity")), 2).as("qty_live"))
      totals.join(live, Seq("l_returnflag"))
        .select(
          col("l_returnflag"), col("n_total"), col("n_live"),
          (col("n_total") - col("n_live")).as("n_deleted"), col("qty_live"))
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN NOT (l_quantity > 45 OR l_discount > 0.08) THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
               CAST(sum(CASE WHEN l_quantity > 45 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
               round(sum(CASE WHEN NOT (l_quantity > 45 OR l_discount > 0.08) THEN l_quantity ELSE 0 END), 2) AS qty_live
            FROM lineitem GROUP BY 1""")
  )

  /** One k-core peel round in oracle SQL. MATERIALIZED is load-bearing:
    * each e_i is referenced three times by round i+1, and DuckDB
    * re-evaluates inlined CTEs per reference — the corpus scan under e0
    * would re-run exponentially (the q98 UnionLoop lesson).
    */
  private def kcorePeelSql(i: Int, k: Int): String = {
    val prev = s"e${i - 1}"
    s"""k$i AS MATERIALIZED (SELECT n FROM (
          SELECT n, count(*) AS d FROM (
            SELECT lo AS n FROM $prev UNION ALL SELECT hi FROM $prev) GROUP BY n)
          WHERE d >= $k),
        e$i AS MATERIALIZED (SELECT lo, hi FROM $prev
          WHERE lo IN (SELECT n FROM k$i) AND hi IN (SELECT n FROM k$i))"""
  }

  /** k-core of the word co-occurrence graph
    * ([[graft.operators.Graph.kCore]], k=3, 4 peel rounds — converged:
    * round 5 is a fixpoint on this corpus): the dense kernel of the
    * q142 PMI top-60 graph. The oracle unrolls the identical peeling.
    */
  val q166KCore: QueryDef = QueryDef(
    "q166_kcore",
    (s, dir) => {
      val edges = graft.operators.Cooccur
        .pmiPairs(Tables.documents(s, dir), window = 2, topK = 60)
        .select(col("a").as("src"), col("b").as("dst"))
      graft.operators.Graph.kCore(edges, k = 3, rounds = 4)
    },
    Some(s"""WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
            pr AS (
              SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b FROM (
                SELECT unnest([{'a': ts[i], 'b': ts[i + 1]}
                               FOR i IN range(1, len(ts))]) AS p FROM t
                UNION ALL
                SELECT unnest([{'a': ts[i], 'b': ts[i + 2]}
                               FOR i IN range(1, len(ts) - 1)]) AS p FROM t)
              WHERE p.a != '' AND p.b != ''),
            e0 AS MATERIALIZED (SELECT a AS lo, b AS hi FROM (
                SELECT a, b, count(*) AS c_ab FROM pr GROUP BY a, b
                ORDER BY c_ab DESC, a ASC, b ASC LIMIT 60)
              WHERE a != b),
            ${(1 to 4).map(kcorePeelSql(_, 3)).mkString(",\n")}
            SELECT n AS node, CAST(count(*) AS BIGINT) AS core_deg
            FROM (SELECT lo AS n FROM e4 UNION ALL SELECT hi FROM e4)
            GROUP BY n""")
  )

  /** Kneser–Ney bigram scoring
    * ([[graft.operators.TextAnalysis.kneserNeyLogProb]], D=0.75):
    * absolute discounting + continuation-count back-off — the stronger
    * smoother next to q155's Jelinek–Mercer. All terms are counts over
    * the one bigram relation; the oracle replays counts and the ln
    * chain with identical association order.
    */
  val q167KneserNey: QueryDef = QueryDef(
    "q167_kneser_ney",
    (s, dir) =>
      graft.operators.TextAnalysis.kneserNeyLogProb(Tables.documents(s, dir)),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            bg0 AS (SELECT doc_id,
                           unnest([{'a': ts[i], 'b': ts[i + 1]}
                                   FOR i IN range(1, len(ts))]) AS p
                    FROM t),
            bg AS (SELECT doc_id, p.a AS w1, p.b AS w2 FROM bg0
                   WHERE p.a != '' AND p.b != ''),
            cb AS (SELECT w1, w2, count(*) AS c_b FROM bg GROUP BY 1, 2),
            cl AS (SELECT w1, sum(c_b) AS c_l, count(*) AS n1_right FROM cb GROUP BY 1),
            nctx AS (SELECT w2, count(*) AS n1_left FROM cb GROUP BY 1),
            nt AS (SELECT count(*) AS n_types FROM cb)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(ln(greatest(c_b - 0.75, 0.0) / c_l +
                                (0.75 * n1_right / c_l) * (n1_left / n_types))), 6)
                     AS mean_kn_ll
            FROM bg JOIN cb USING (w1, w2) JOIN cl USING (w1) JOIN nctx USING (w2), nt
            GROUP BY doc_id""")
  )

  /** Seasonal anomaly detection
    * ([[graft.operators.Drift.seasonalAnomalies]]): hourly counts
    * scored against the same-hour-of-day baseline across days; σ from
    * exact integer sums so both engines evaluate one identical double
    * chain (no engine-internal variance accumulator).
    */
  val q168SeasonalAnomaly: QueryDef = QueryDef(
    "q168_seasonal_anomaly",
    (s, dir) => graft.operators.Drift.seasonalAnomalies(Tables.events(s, dir)),
    Some("""WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(hour(ts) AS INT) AS hr, CAST(count(*) AS BIGINT) AS cnt
                 FROM events GROUP BY 1, 2, 3),
            b AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(cnt) AS BIGINT) AS s1, CAST(sum(cnt * cnt) AS BIGINT) AS s2
                  FROM h GROUP BY 1, 2),
            b2 AS (SELECT event_type, hr, n_days,
                   CAST(s1 AS DOUBLE) / n_days AS mu,
                   sqrt((s2 - CAST(s1 AS DOUBLE) / n_days * s1) / (n_days - 1)) AS sigma
                  FROM b)
            SELECT h.event_type, h.day, h.hr, h.cnt,
                   round(mu, 6) AS mu, round(sigma, 6) AS sigma,
                   round((h.cnt - mu) / sigma, 6) AS z
            FROM h JOIN b2 USING (event_type, hr)
            WHERE n_days >= 3 AND sigma > 0 AND abs((h.cnt - mu) / sigma) > 2""")
  )

  /** Streaming DDSketch
    * ([[graft.streaming.StreamingOps.runStreamingDdSketch]]): log-γ bin
    * counts as ONE stateful streaming aggregation (bin counts are sums
    * — end state ≡ batch; state bounded by the bin span, not the
    * stream), quantiles extracted at read time. Oracle = q154's batch
    * bin replay minus the exact-percentile riders.
    */
  val q169StreamDdSketch: QueryDef = QueryDef(
    "q169_stream_ddsketch",
    (s, dir) => graft.streaming.StreamingOps.runStreamingDdSketch(s, dir),
    Some("""WITH v AS (SELECT event_type, value FROM events WHERE value > 0),
            b AS (SELECT event_type,
                         CAST(ceil(ln(value) / ln(1.02 / 0.98)) AS BIGINT) AS i
                  FROM v),
            c AS (SELECT event_type, i, count(*) AS cnt FROM b GROUP BY 1, 2),
            cum AS (SELECT event_type, i,
                      sum(cnt) OVER (PARTITION BY event_type ORDER BY i) AS cum,
                      sum(cnt) OVER (PARTITION BY event_type) AS n
                    FROM c),
            sel AS (SELECT event_type, CAST(min(n) AS BIGINT) AS n,
                      min(CASE WHEN cum >= floor(0.5 * (n - 1)) + 1 THEN i END) AS i50,
                      min(CASE WHEN cum >= floor(0.95 * (n - 1)) + 1 THEN i END) AS i95,
                      min(CASE WHEN cum >= floor(0.99 * (n - 1)) + 1 THEN i END) AS i99
                    FROM cum GROUP BY event_type)
            SELECT event_type, n,
              round(2 * power(1.02 / 0.98, i50) / (1.02 / 0.98 + 1), 6) AS p50_est,
              round(2 * power(1.02 / 0.98, i95) / (1.02 / 0.98 + 1), 6) AS p95_est,
              round(2 * power(1.02 / 0.98, i99) / (1.02 / 0.98 + 1), 6) AS p99_est
            FROM sel""")
  )

  /** Association rules ([[graft.operators.Cooccur.associationRules]],
    * minSupport=3): market-basket support/confidence/lift over order
    * baskets of parts — exact integer counts, single-division metrics.
    */
  val q170AssocRules: QueryDef = QueryDef(
    "q170_assoc_rules",
    (s, dir) =>
      graft.operators.Cooccur.associationRules(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey"),
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
            pairs AS (SELECT a.it AS item_a, b.it AS item_b,
                             CAST(count(*) AS BIGINT) AS supp
                      FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
                      GROUP BY 1, 2 HAVING count(*) >= 3),
            sup AS (SELECT it, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY 1),
            nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM items)
            SELECT item_a, item_b, supp,
                   round(CAST(supp AS DOUBLE) / sa.s, 6) AS conf_ab,
                   round(CAST(supp AS DOUBLE) / sb.s, 6) AS conf_ba,
                   round(CAST(supp AS DOUBLE) * n_baskets / (sa.s * sb.s), 6) AS lift
            FROM pairs
            JOIN sup sa ON sa.it = item_a
            JOIN sup sb ON sb.it = item_b
            CROSS JOIN nb""")
  )

  /** Skyline / Pareto front ([[graft.operators.Skyline.pareto2d]]):
    * parts minimizing retail price while maximizing size, by the
    * sort-based level formulation (keyed agg + level-relation running
    * max — no quadratic dominance join). The oracle replays the same
    * levels; OperatorsSpec pins equivalence to the brute-force
    * dominance definition.
    */
  val q171Skyline: QueryDef = QueryDef(
    "q171_skyline",
    (s, dir) =>
      graft.operators.Skyline.pareto2d(
        Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size"),
    Some("""WITH lvl AS (SELECT p_retailprice AS c, max(p_size) AS m FROM part GROUP BY 1),
            r AS (SELECT c, m, max(m) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                  FROM lvl),
            keep AS (SELECT c, m FROM r WHERE pm IS NULL OR m > pm)
            SELECT p_partkey, p_retailprice, p_size
            FROM part JOIN keep ON p_retailprice = c AND p_size = m""")
  )

  /** One HITS half-step in oracle SQL: quantized aggregate, max
    * normalizer, quantized ratio. MATERIALIZED for the same
    * re-evaluation reason as [[kcorePeelSql]].
    */
  private def hitsQ(x: String): String =
    s"floor(($x) * 1099511627776.0) / 1099511627776.0"

  private def hitsStepSql(i: Int): String = {
    val prevH = if (i == 1) "h0" else s"h${i - 1}"
    s"""a${i}r AS MATERIALIZED (SELECT e.dst, ${hitsQ(s"sum($prevH.h)")} AS a0
          FROM e JOIN $prevH ON $prevH.src = e.src GROUP BY e.dst),
        a$i AS MATERIALIZED (SELECT dst, ${hitsQ("a0 / am")} AS a
          FROM a${i}r, (SELECT max(a0) AS am FROM a${i}r)),
        h${i}r AS MATERIALIZED (SELECT e.src, ${hitsQ(s"sum(a$i.a)")} AS hv
          FROM e JOIN a$i ON a$i.dst = e.dst GROUP BY e.src),
        h$i AS MATERIALIZED (SELECT src, ${hitsQ("hv / hm")} AS h
          FROM h${i}r, (SELECT max(hv) AS hm FROM h${i}r))"""
  }

  /** HITS hubs & authorities ([[graft.operators.Graph.hits]], 2
    * iterations) over the customer→part purchase bipartite graph:
    * authorities = parts bought by broad buyers, hubs = customers
    * buying popular parts. Max-normalized (exact normalizer),
    * grid-quantized aggregates; the oracle unrolls both iterations.
    */
  val q172Hits: QueryDef = QueryDef(
    "q172_hits",
    (s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
      graft.operators.Graph.hits(edges)
    },
    Some(s"""WITH e AS MATERIALIZED (
              SELECT DISTINCT o_custkey AS src, l_partkey AS dst
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
            h0 AS (SELECT src, 1.0 AS h FROM (SELECT DISTINCT src FROM e)),
            ${(1 to 2).map(hitsStepSql).mkString(",\n")}
            SELECT * FROM (
              SELECT 'auth' AS role, dst AS id, round(a, 6) AS score
              FROM a2 ORDER BY a DESC, dst ASC LIMIT 20)
            UNION ALL
            SELECT * FROM (
              SELECT 'hub' AS role, src AS id, round(h, 6) AS score
              FROM h2 ORDER BY h DESC, src ASC LIMIT 20)""")
  )

  /** CDC changelog compaction
    * ([[graft.operators.Changelog.compactLog]]): lineitem rows recast
    * as a per-order change log ('R' lines = delete tombstones); the
    * snapshot keeps each order's head change unless it is a tombstone.
    * The synthetic `l_linenumber` repeats within an order, so the
    * unique per-key sequence the CDC contract requires is derived as a
    * `row_number` over the total order (linenumber, partkey, suppkey,
    * qty, price) — full rows are distinct, so the ordering (and hence
    * the snapshot) is deterministic. Rank-1 selection plans as
    * WindowGroupLimit.
    */
  val q173CdcCompact: QueryDef = QueryDef(
    "q173_cdc_compact",
    (s, dir) => {
      val wSeq = Window
        .partitionBy(col("l_orderkey"))
        .orderBy(
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
      val changes = Tables.lineitem(s, dir)
        .withColumn("seq", row_number().over(wSeq))
        .select(
          col("l_orderkey"),
          col("seq"),
          when(col("l_returnflag") === "R", "D")
            .when(col("seq") === 1, "I")
            .otherwise("U").as("op"),
          col("l_quantity").as("qty"),
          col("l_extendedprice").as("price"))
      graft.operators.Changelog.compactLog(changes, Seq("l_orderkey"), "seq", "op")
    },
    Some("""WITH ch AS (SELECT l_orderkey,
                   CAST(row_number() OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey,
                              l_quantity, l_extendedprice) AS INT) AS seq,
                   l_returnflag, l_quantity AS qty, l_extendedprice AS price
                 FROM lineitem),
            ch2 AS (SELECT l_orderkey, seq,
                   CASE WHEN l_returnflag = 'R' THEN 'D'
                        WHEN seq = 1 THEN 'I' ELSE 'U' END AS op,
                   qty, price FROM ch),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY l_orderkey ORDER BY seq DESC) AS rn FROM ch2)
            SELECT l_orderkey, seq, op, qty, price
            FROM r WHERE rn = 1 AND op != 'D'""")
  )

  /** Largest-remainder budget apportionment
    * ([[graft.operators.Sampling.largestRemainderAlloc]], budget=123):
    * exact integer allocation across sources — quotas, floors,
    * remainders by largest fraction with name tie-break; Σ alloc =
    * budget exactly.
    */
  val q174BudgetAlloc: QueryDef = QueryDef(
    "q174_budget_alloc",
    (s, dir) =>
      graft.operators.Sampling.largestRemainderAlloc(
        Tables.documents(s, dir), "source", 123L),
    Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(n_s) AS BIGINT) AS total FROM c),
            q AS (SELECT source, n_s, 123 * n_s / total AS quota,
                         CAST(floor(123 * n_s / total) AS BIGINT) AS base
                  FROM c, t),
            d AS (SELECT 123 - CAST(sum(base) AS BIGINT) AS deficit FROM q),
            r AS (SELECT *, row_number() OVER (
                    ORDER BY quota - base DESC, source ASC) AS rn FROM q, d)
            SELECT source, n_s,
                   base + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS alloc
            FROM r""")
  )

  /** PIVOT (long → wide) — the transpose twin of q51's unpivot:
    * per-ship-year quantity totals spread across explicit return-flag
    * columns. The value list is explicit (A/N/R), so the output schema
    * is static — the form that survives at scale; an inferred-values
    * pivot needs a distinct-scan first. Quantities cast to BIGINT
    * before summing (exact, order-independent).
    */
  val q175Pivot: QueryDef = QueryDef(
    "q175_pivot",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("ship_year", year(col("l_shipdate")))
        .withColumn("qty", col("l_quantity").cast("long"))
        .groupBy(col("ship_year"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("qty")))
        .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r")),
    Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
              CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_a,
              CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_n,
              CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_r
            FROM lineitem GROUP BY 1""")
  )

  /** Window DISTRIBUTION functions — ntile / percent_rank / cume_dist
    * complete the ranking-family surface (q9 covers rank/dense_rank/
    * row_number). Ordering is made total with the key tie-break so
    * every rank — and therefore every exact rational the three
    * functions emit — is deterministic.
    */
  val q176WindowDist: QueryDef = QueryDef(
    "q176_window_dist",
    (s, dir) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
              CAST(ntile(4) OVER w AS INT) AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist() OVER w, 6) AS cume
            FROM orders WHERE o_orderkey % 10 = 0
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)""")
  )

  /** EWMA smoothing ([[graft.operators.Timeseries.ewma]], α=0.25,
    * L=16): per-event-type exponentially weighted value series — the
    * bounded-kernel form whose per-row work is a fixed fold over the
    * window slice. The oracle replays the identical ascending-time
    * weighted fold as a DuckDB list comprehension.
    */
  val q177Ewma: QueryDef = QueryDef(
    "q177_ewma",
    (s, dir) =>
      graft.operators.Timeseries.ewma(
        Tables.events(s, dir).select(
          col("event_id"), col("event_type"), col("ts"), col("value")),
        Seq("event_type"), Seq("ts", "event_id"), "value",
        alpha = 0.25, window = 16)
        .select(col("event_id"), col("event_type"), col("ewma")),
    Some("""WITH w AS (SELECT event_id, event_type,
                 list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
               FROM events)
            SELECT event_id, event_type,
              round(list_sum([arr[j+1] * pow(0.75, len(arr)-1-j) FOR j IN range(len(arr))])
                    / list_sum([pow(0.75, len(arr)-1-j) FOR j IN range(len(arr))]), 6) AS ewma
            FROM w""")
  )

  /** One PCA power-iteration step in oracle SQL: exact 64-term
    * dot-products (2^-40 dyadic summands — order-free), max
    * normalizer, re-snapped ratio. MATERIALIZED like [[hitsStepSql]].
    */
  private def pcaQ(x: String): String =
    s"floor(($x) * 1048576.0) / 1048576.0"

  private def pcaStepSql(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""u$i AS MATERIALIZED (SELECT c.i, sum(c.c * $prev.v) AS u
          FROM c JOIN $prev ON $prev.i = c.j GROUP BY 1),
        v$i AS MATERIALIZED (SELECT i,
          ${pcaQ(s"u / (SELECT max(abs(u)) FROM u$i)")} AS v FROM u$i)"""
  }

  /** PCA top principal component ([[graft.operators.Pca.topComponent]],
    * 4 power iterations): component loadings plus the strongest centered
    * projections. The oracle replays mean/second-moment snapping, the
    * covariance grid, and every iteration — iteration sums are EXACT
    * dyadic folds, so only the two corpus-scale reductions carry the
    * documented snap-boundary ulp posture.
    */
  val q178Pca: QueryDef = QueryDef(
    "q178_pca",
    (s, dir) => graft.operators.Pca.topComponent(Tables.embeddings(s, dir)),
    Some(s"""WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
            e AS MATERIALIZED (
              SELECT vec_id, i.i AS i, CAST(embedding[i.i + 1] AS DOUBLE) AS x
              FROM embeddings, range(0, 64) i(i)),
            mu AS MATERIALIZED (
              SELECT i, ${pcaQ("avg(x)")} AS mu FROM e GROUP BY 1),
            s AS MATERIALIZED (
              SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS s
              FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
            c AS MATERIALIZED (
              SELECT s.i, s.j,
                ${pcaQ(s"${pcaQ("s.s / (SELECT n FROM nn)")} - mi.mu * mj.mu")} AS c
              FROM s JOIN mu mi ON mi.i = s.i JOIN mu mj ON mj.i = s.j),
            v0 AS (SELECT i.i AS i, 1.0 AS v FROM range(0, 64) i(i)),
            ${(1 to 4).map(pcaStepSql).mkString(",\n")},
            sgn AS (SELECT CASE WHEN (
                SELECT v FROM v4 ORDER BY abs(v) DESC, i ASC LIMIT 1
              ) < 0 THEN -1.0 ELSE 1.0 END AS sg),
            vf AS (SELECT i, v * (SELECT sg FROM sgn) AS v FROM v4),
            proj AS (
              SELECT 'proj' AS role, e.vec_id AS id,
                     round(sum((e.x - mu.mu) * vf.v), 6) AS score
              FROM e JOIN mu ON mu.i = e.i JOIN vf ON vf.i = e.i
              GROUP BY e.vec_id
              ORDER BY score DESC, e.vec_id ASC LIMIT 10)
            SELECT 'load' AS role, CAST(i AS BIGINT) AS id, round(v, 6) AS score FROM vf
            UNION ALL
            SELECT * FROM proj""")
  )

  /** ROC-AUC ([[graft.operators.Eval.rocAuc]]): per-source AUC of
    * document length as a predictor of English — the Mann–Whitney
    * rank-sum identity with integer midranks; no pos×neg pair join.
    */
  val q179RocAuc: QueryDef = QueryDef(
    "q179_roc_auc",
    (s, dir) =>
      graft.operators.Eval.rocAuc(
        Tables.documents(s, dir)
          .select(col("source"), col("n_chars"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y")),
        "source", "n_chars", "y"),
    Some("""WITH d AS (SELECT source, n_chars,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
            r AS (SELECT source, y,
                   2 * rank() OVER (PARTITION BY source ORDER BY n_chars)
                     + count(*) OVER (PARTITION BY source, n_chars) - 1 AS mr2
                  FROM d),
            a AS (SELECT source,
                   CAST(sum(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS BIGINT) AS s2r,
                   CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg
                  FROM r GROUP BY 1)
            SELECT source, n_pos, n_neg,
                   round(CAST(s2r - n_pos * (n_pos + 1) AS DOUBLE)
                         / (2.0 * n_pos * n_neg), 6) AS auc
            FROM a WHERE n_pos > 0 AND n_neg > 0""")
  )

  /** Mutual-information feature ranking
    * ([[graft.operators.Eval.mutualInformation]]): three candidate
    * document features scored against the is-English label from exact
    * contingency counts — the filter-selection step between quality
    * scoring and mixture sampling.
    */
  val q180FeatureMi: QueryDef = QueryDef(
    "q180_feature_mi",
    (s, dir) =>
      graft.operators.Eval.mutualInformation(
        Tables.documents(s, dir).select(
          (col("n_chars") > 300).as("len_gt300"),
          (col("n_chars") % 2 === 0).as("len_even"),
          col("text").rlike("^[A-Z]").as("starts_upper"),
          (col("lang") === "en").as("y")),
        Seq("len_gt300", "len_even", "starts_upper"), "y"),
    Some("""WITH m AS (
              SELECT f.feature,
                CASE f.feature
                  WHEN 'len_gt300' THEN CAST(n_chars > 300 AS VARCHAR)
                  WHEN 'len_even' THEN CAST(n_chars % 2 = 0 AS VARCHAR)
                  ELSE CAST(regexp_matches(text, '^[A-Z]') AS VARCHAR)
                END AS fval,
                CAST(lang = 'en' AS VARCHAR) AS y
              FROM documents,
                   (SELECT unnest(['len_gt300', 'len_even', 'starts_upper']) AS feature) f),
            cells AS (SELECT feature, fval, y, count(*) AS c FROM m GROUP BY 1, 2, 3),
            mf AS (SELECT feature, fval, count(*) AS cf FROM m GROUP BY 1, 2),
            my AS (SELECT feature, y, count(*) AS cy FROM m GROUP BY 1, 2),
            nn AS (SELECT feature, count(*) AS n FROM m GROUP BY 1)
            SELECT c.feature, CAST(max(nn.n) AS BIGINT) AS n,
                   round(sum((CAST(c.c AS DOUBLE) / nn.n)
                         * ln(CAST(c.c AS DOUBLE) * nn.n
                              / (CAST(mf.cf AS DOUBLE) * my.cy))), 6) AS mi
            FROM cells c
            JOIN mf ON mf.feature = c.feature AND mf.fval = c.fval
            JOIN my ON my.feature = c.feature AND my.y = c.y
            JOIN nn ON nn.feature = c.feature
            GROUP BY 1""")
  )

  /** Benford first-digit audit ([[graft.operators.Checks.benfordDigits]])
    * of order totals: per-digit observed counts, expected log-law mass,
    * and χ² addends — digits via exact integer-cents string arithmetic,
    * never float log10.
    */
  val q181Benford: QueryDef = QueryDef(
    "q181_benford",
    (s, dir) =>
      graft.operators.Checks.benfordDigits(Tables.orders(s, dir), "o_totalprice"),
    Some("""WITH obs AS (
              SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS VARCHAR), 1, 1) AS INT) AS digit,
                     CAST(count(*) AS BIGINT) AS obs
              FROM orders WHERE o_totalprice > 0 GROUP BY 1),
            t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs)
            SELECT digit, obs,
                   round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected_p,
                   round(pow(CAST(obs AS DOUBLE) / n
                             - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                         / (ln(1.0 + 1.0 / digit) / ln(10.0)) * n, 6) AS chi2_term
            FROM obs, t""")
  )

  /** Weekly retention cohorts
    * ([[graft.operators.Sessionize.retentionMatrix]]): users bucketed
    * by first-seen week, every (cohort, week-offset) cell with exact
    * distinct actives and the retention ratio.
    */
  val q182Retention: QueryDef = QueryDef(
    "q182_retention",
    (s, dir) =>
      graft.operators.Sessionize.retentionMatrix(
        Tables.events(s, dir), "user_id", "ts"),
    Some("""WITH fw AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
                 FROM events GROUP BY 1),
            act AS (SELECT DISTINCT e.user_id, fw.cw,
                      CAST(datediff('week', fw.cw, date_trunc('week', e.ts)) AS INT) AS week_offset
                    FROM events e JOIN fw ON fw.user_id = e.user_id),
            cs AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size FROM fw GROUP BY 1)
            SELECT act.cw AS cohort_week, week_offset,
                   CAST(count(*) AS BIGINT) AS active_users, cohort_size,
                   round(CAST(count(*) AS DOUBLE) / cohort_size, 6) AS retention
            FROM act JOIN cs ON cs.cw = act.cw GROUP BY 1, 2, 4""")
  )

  /** Calibration reliability bins
    * ([[graft.operators.Eval.calibrationBins]]): a length-logistic
    * pseudo-probability of English against the true label, 10 bins —
    * per-bin confidence vs accuracy gaps (whose weighted sum is ECE).
    * The probability is rounded BEFORE binning so the bin of every row
    * is ulp-stable cross-engine.
    */
  val q183Calibration: QueryDef = QueryDef(
    "q183_calibration",
    (s, dir) =>
      graft.operators.Eval.calibrationBins(
        Tables.documents(s, dir).select(
          round(lit(1.0) / (lit(1.0) + exp(-(col("n_chars") - 306) / lit(100.0))), 6)
            .as("p"),
          (col("lang") === "en").cast("long").as("y")),
        "p", "y"),
    Some("""WITH s AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   round(1.0 / (1.0 + exp(-(n_chars - 306) / 100.0)), 6) AS p
                 FROM documents)
            SELECT CAST(floor(p * 10) AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
                   round(avg(p), 6) AS avg_conf,
                   round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos,
                   round(abs(avg(p) - CAST(sum(y) AS DOUBLE) / count(*)), 6) AS gap
            FROM s GROUP BY 1""")
  )

  /** Jaro–Winkler scoring ([[graft.functions.JaroWinkler]], via its SQL
    * registration): similarity of successive part names — the custom
    * codegen expression scored against DuckDB's native
    * jaro_winkler_similarity, pinning the full windowed
    * match/transposition/prefix-boost algorithm cross-engine.
    */
  val q184JaroWinkler: QueryDef = QueryDef(
    "q184_jaro_winkler",
    (s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
      p.as("a")
        .join(p.as("b"), col("a.p_partkey") + 1 === col("b.p_partkey"))
        .select(
          col("a.p_partkey").as("p_partkey"),
          round(expr("jaro_winkler(a.p_name, b.p_name)"), 6).as("jw"))
    },
    Some("""SELECT a.p_partkey AS p_partkey,
                   round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
            FROM part a JOIN part b ON a.p_partkey + 1 = b.p_partkey""")
  )

  /** Watermark-bounded streaming key dedup
    * ([[graft.streaming.StreamingOps.runStreamingDedupWm]]):
    * `dropDuplicatesWithinWatermark` with state reclaimed past the
    * delay horizon; per-type kept-key counts ≡ batch DISTINCT on the
    * bounded replay.
    */
  val q185StreamDedupWm: QueryDef = QueryDef(
    "q185_stream_dedup_wm",
    (s, dir) => graft.streaming.StreamingOps.runStreamingDedupWm(s, dir),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys
            FROM (SELECT DISTINCT user_id, event_type FROM events)
            GROUP BY 1""")
  )

  /** Gopher document-quality rule battery
    * ([[graft.operators.TextAnalysis.gopherRules]]): the Rae et al. 2021
    * pre-training filter — word-count / mean-word-length bounds,
    * symbol-to-word ratio, bullet- and ellipsis-line fractions,
    * alphabetic-word fraction, minimum stop-word hits. Thresholds are
    * integer cross-multiplications, so every pass/fail boolean is exact
    * in both engines; the float ratios are report columns only.
    */
  val q186GopherRules: QueryDef = QueryDef(
    "q186_gopher_rules",
    (s, dir) => graft.operators.TextAnalysis.gopherRules(Tables.documents(s, dir)),
    Some("""WITH m AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                     CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                     CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS w_chars,
                     CAST(length(text) - length(replace(text, '#', ''))
                          + len(regexp_extract_all(text, '\.\.\.|…')) AS BIGINT) AS n_sym,
                     CAST(len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) AS n_bullet,
                     CAST(len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT) AS n_ell_lines,
                     CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                       w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                     CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                       w -> w IN ('the','a','of','and','to','in','is','on','for','with')))
                       AS BIGINT) AS n_stop
              FROM documents)
            SELECT doc_id, n_words,
                   round(CAST(w_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
                   round(CAST(n_sym AS DOUBLE) / n_words, 6) AS symbol_ratio,
                   round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_line_ratio,
                   round(CAST(n_ell_lines AS DOUBLE) / n_lines, 6) AS ellipsis_line_ratio,
                   round(CAST(n_alpha AS DOUBLE) / n_words, 6) AS alpha_word_ratio,
                   n_stop AS n_stopwords,
                   (n_words >= 50 AND n_words <= 100000) AS words_ok,
                   (w_chars >= n_words * 3 AND w_chars <= n_words * 10) AS word_len_ok,
                   (n_sym * 10 <= n_words) AS symbol_ok,
                   (n_bullet * 10 < n_lines * 9) AS bullet_ok,
                   (n_ell_lines * 10 < n_lines * 3) AS ellipsis_ok,
                   (n_alpha * 5 >= n_words * 4) AS alpha_ok,
                   (n_stop >= 2) AS stopword_ok,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (w_chars >= n_words * 3 AND w_chars <= n_words * 10)
                    AND (n_sym * 10 <= n_words)
                    AND (n_bullet * 10 < n_lines * 9)
                    AND (n_ell_lines * 10 < n_lines * 3)
                    AND (n_alpha * 5 >= n_words * 4)
                    AND (n_stop >= 2)) AS passes_gopher
            FROM m""")
  )

  /** Deterministic URL derivation shared by q187/q188: every doc gets a
    * well-formed crawl URL exercising subdomain presence (www./cdn./bare
    * by doc_id mod 3), path depth, and an optional tracking param (even
    * doc_ids only). Identical string arithmetic on the DuckDB side.
    */
  private def withUrls(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.documents(s, dir)
    d.withColumn(
      "url",
      concat(
        lit("https://"),
        element_at(array(lit("www."), lit("cdn."), lit("")),
          (col("doc_id") % 3).cast("int") + 1),
        lit("docs-"), col("source"), lit(".com/"),
        col("lang"), lit("/doc/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("?ref="), (col("doc_id") % 7).cast("string")))
          .otherwise(lit(""))))
      .select("doc_id", "url")
  }

  private val urlSql =
    """SELECT doc_id,
         'https://' ||
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END ||
         'docs-' || source || '.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 2 = 0 THEN '?ref=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
         AS url
       FROM documents"""

  /** URL decomposition ([[graft.operators.UrlOps.parseUrls]]): host /
    * registered domain / path / path depth / tracking param via Spark's
    * codegen'd `parse_url`, replayed in DuckDB with exact regexp string
    * arithmetic on the identically-derived URL.
    */
  val q187UrlParse: QueryDef = QueryDef(
    "q187_url_parse",
    (s, dir) =>
      graft.operators.UrlOps.parseUrls(withUrls(s, dir), "url", Seq("ref")),
    Some(s"""WITH u AS ($urlSql),
            p AS (SELECT doc_id, url,
                         regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
                         regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path
                  FROM u)
            SELECT doc_id, url, host,
                   regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS registered_domain,
                   path,
                   CASE WHEN length(path) = 0 THEN 0
                        ELSE CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
                             - CASE WHEN path LIKE '%/' THEN 1 ELSE 0 END
                   END AS path_depth,
                   CASE WHEN url LIKE '%?ref=%'
                        THEN regexp_extract(url, 'ref=([0-9]+)', 1) END AS query_ref
            FROM p""")
  )

  /** Per-registered-domain crawl profile
    * ([[graft.operators.UrlOps.domainProfile]]): doc count, distinct
    * hosts/paths, mean path depth — the site-catalog-sized rollup a
    * crawler caps per-site ingestion by.
    */
  val q188DomainProfile: QueryDef = QueryDef(
    "q188_domain_profile",
    (s, dir) =>
      graft.operators.UrlOps.domainProfile(
        graft.operators.UrlOps.parseUrls(withUrls(s, dir), "url")),
    Some(s"""WITH u AS ($urlSql),
            p AS (SELECT doc_id, url,
                         regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
                         regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path
                  FROM u),
            d AS (SELECT doc_id, host,
                         regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS registered_domain,
                         path,
                         CASE WHEN length(path) = 0 THEN 0
                              ELSE CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
                                   - CASE WHEN path LIKE '%/' THEN 1 ELSE 0 END
                         END AS path_depth
                  FROM p)
            SELECT registered_domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
                   round(avg(CAST(path_depth AS DOUBLE)), 6) AS avg_path_depth
            FROM d GROUP BY 1""")
  )

  /** Jensen–Shannon token-distribution drift per source
    * ([[graft.operators.Drift.jsVsRest]]): bounded symmetric divergence
    * of each source's word mix against the rest of the corpus. The
    * oracle replays the full count-grid + snapped-addend chain; the
    * 2⁻³⁰ dyadic snap makes the Σ order-insensitive in both engines.
    */
  val q189JsDrift: QueryDef = QueryDef(
    "q189_js_drift",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      graft.operators.Drift.jsVsRest(toks, "source", "word")
    },
    Some("""WITH tok AS (
              SELECT source, unnest(string_split(text, ' ')) AS v FROM documents),
            counts AS (
              SELECT source, v, CAST(count(*) AS BIGINT) AS c
              FROM tok WHERE length(v) > 0 GROUP BY 1, 2),
            groups AS (SELECT source, sum(c) AS n_g FROM counts GROUP BY 1),
            vals AS (SELECT v, sum(c) AS c_all FROM counts GROUP BY 1),
            grand AS (SELECT sum(c_all) AS n_all FROM vals),
            grid AS (
              SELECT g.source, g.n_g, v.v, v.c_all, gr.n_all,
                     coalesce(c.c, 0) AS c
              FROM groups g CROSS JOIN grand gr CROSS JOIN vals v
              LEFT JOIN counts c ON c.source = g.source AND c.v = v.v),
            terms AS (
              SELECT source, n_g,
                     CASE WHEN c > 0 THEN
                       floor((CAST(c AS DOUBLE) / n_g) *
                             ln((CAST(c AS DOUBLE) / n_g) /
                                ((CAST(c AS DOUBLE) / n_g +
                                  CAST(c_all - c AS DOUBLE) / (n_all - n_g)) / 2.0)) *
                             1073741824.0 + 0.5) / 1073741824.0
                     ELSE 0.0 END AS add_p,
                     CASE WHEN c_all - c > 0 THEN
                       floor((CAST(c_all - c AS DOUBLE) / (n_all - n_g)) *
                             ln((CAST(c_all - c AS DOUBLE) / (n_all - n_g)) /
                                ((CAST(c AS DOUBLE) / n_g +
                                  CAST(c_all - c AS DOUBLE) / (n_all - n_g)) / 2.0)) *
                             1073741824.0 + 0.5) / 1073741824.0
                     ELSE 0.0 END AS add_q
              FROM grid)
            SELECT source, CAST(min(n_g) AS BIGINT) AS n,
                   round((sum(add_p) + sum(add_q)) / 2.0, 6) AS js_vs_rest
            FROM terms GROUP BY 1""")
  )

  /** Content-defined chunk dedup ([[graft.operators.Dedup.cdcChunks]]):
    * rolling-hash boundaries (md5 of the 4-gram ending at each token,
    * ≡ 0 mod 16) make chunk identity insertion-resilient — the
    * rsync/LBFS trick q94's fixed windows lack. The oracle replays
    * boundary flags, the chunk-id cumsum, ordered chunk assembly, and
    * cross-doc sharing verbatim.
    */
  val q190CdcChunks: QueryDef = QueryDef(
    "q190_cdc_chunks",
    (s, dir) => graft.operators.Dedup.cdcChunks(Tables.documents(s, dir)),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            tok AS (SELECT doc_id, pr.pos AS pos, pr.tok AS tok, pr.b AS b FROM (
                      SELECT doc_id,
                             unnest([{'pos': i, 'tok': ts[i + 1],
                                      'b': CASE WHEN i >= 3 THEN
                                             CAST(('0x' || substring(md5(array_to_string(
                                               ts[i - 2 : i + 1], ' ')), 1, 8)) AS BIGINT)
                                             % 16 = 0
                                           ELSE false END}
                                     FOR i IN range(0, len(ts))]) AS pr
                      FROM t)),
            cid AS (SELECT doc_id, pos, tok,
                           coalesce(sum(CASE WHEN b THEN 1 ELSE 0 END) OVER (
                             PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                             AS chunk_id
                    FROM tok),
            chunks AS (SELECT doc_id, chunk_id,
                              CAST(count(*) AS BIGINT) AS n_tok,
                              md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
                       FROM cid GROUP BY 1, 2),
            shared AS (SELECT chunk_md5 FROM chunks GROUP BY 1
                       HAVING count(DISTINCT doc_id) >= 2)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN chunk_md5 IN (SELECT chunk_md5 FROM shared)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
                   max(n_tok) AS max_chunk_tokens
            FROM chunks GROUP BY 1""")
  )

  val all: Seq[QueryDef] = Seq(
    q123AnnIvfPq, q124ImageRoundtrip, q125BalancedSample, q126UnigramLogprob,
    q127DedupRetention, q128GapFill, q129Bm25, q130Profile, q131Scd2, q132Funnel,
    q133EmbedQuant, q134RagChunks, q135Normalize, q136BpeTrain, q137CmsHeavy,
    q138Pmi, q139Bloom, q140TempMixture, q141Contrastive, q142Triangles,
    q143Winsorize, q144BpeEncode, q145RepeatedSpans, q146ExactSample, q147Hll,
    q148WeightedSample, q149KsDrift, q150MadOutliers, q151LabelProp,
    q152NodeJaccard, q153RrfFusion, q154DdSketch, q155BigramLm, q156CharEntropy,
    q157SemanticDecontam, q158TrigramSearch, q159EquiDepth, q160Attribution,
    q161StreamHll, q162SourceCap, q163StreamCms, q164KmvIntersect,
    q165DeletionVectors, q166KCore, q167KneserNey, q168SeasonalAnomaly,
    q169StreamDdSketch, q170AssocRules, q171Skyline, q172Hits,
    q173CdcCompact, q174BudgetAlloc, q175Pivot, q176WindowDist, q177Ewma,
    q178Pca, q179RocAuc, q180FeatureMi, q181Benford, q182Retention,
    q183Calibration, q184JaroWinkler, q185StreamDedupWm, q186GopherRules,
    q187UrlParse, q188DomainProfile, q189JsDrift, q190CdcChunks)
}
