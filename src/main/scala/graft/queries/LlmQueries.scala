package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.RollingHash64
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

/** LLM-training-data pipeline queries over `documents` / `embeddings`:
  * dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute + LSH ANN), text analysis (quality, tokens,
  * language ID, fingerprinting) and multimodal metadata decode.
  *
  * Oracle policy: everything expressible as deterministic arithmetic has a
  * DuckDB oracle (including the ANN brute-force ranking — both engines
  * fold the dot product in element order). Signature-based methods
  * (xxhash64 permutations, SRP hyperplanes, rolling hash) have no DuckDB
  * equivalent and are rows-only, with their exact-verification kernels
  * covered by the oracle-checked variants and ScalaTest goldens.
  */
object LlmQueries {

  /** The 64-element double dot/norm fold, as DuckDB SQL. */
  private[queries] def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) FOR i IN range(1, 65)])"

  val q25DedupExact: QueryDef = QueryDef(
    "q25_dedup_exact",
    (s, dir) => Dedup.exactGroups(Tables.documents(s, dir)),
    Some("""SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
            count(*) AS dup_cnt
            FROM documents GROUP BY md5(text)""")
  )

  /** The EXACT word-trigram Jaccard pair set in DuckDB — the oracle for
    * every near-dup pipeline whose OUTPUT is the exact pair set at
    * t = 0.8: q28 (PPJoin, lossless by construction) and q26/q45
    * (MinHash-LSH banded candidates + exact verification; banding recall
    * at the corpus's planted similarities j >= 0.8 is
    * 1 - (1 - 0.8^4)^16 ≈ 0.9998 per borderline pair and ≈ 1 - 4e-8 at
    * j = 0.9 — and the seeded hash family is deterministic, so equality
    * with the exact set is a fixed fact of this corpus, verified at
    * sf0.01 and sf0.1).
    *
    * r12 rewrite: the all-pairs θ-join (`s a JOIN s b ON a.doc_id <
    * b.doc_id` + per-pair list_intersect) was DuckDB-intractable at
    * sf0.1 (>100 CPU-min, the reason for the 12-entry sweep skip list) —
    * replaced by an INVERTED-INDEX join: unnest each doc's distinct
    * grams to postings, equi-join postings on gram, count shared grams
    * per (doc_a, doc_b), then J = inter / (sz_a + sz_b − inter). Lossless
    * for any t > 0 (a pair with zero shared grams has J = 0), the same
    * integers feed the same double division and round(·, 6), and the
    * candidate set is Σ_gram df² ≈ linear on this corpus (max df 25 at
    * sf0.1) — 8 s where the θ-join burned hours, so the whole pair-oracle
    * family now sweeps at sf0.1 (old ≡ new replayed at sf0.001/sf0.01
    * before the swap; 25/25 and 256-pair sf0.1 sets equal).
    */
  private[queries] def ngramJaccardOracleAt(t: String): String =
    s"""WITH g AS (
              SELECT doc_id,
                     list_distinct([array_to_string(string_split(text, ' ')[i:i+2], ' ')
                                    FOR i IN range(1, len(string_split(text, ' ')) - 1)]) AS gs
              FROM documents),
            s AS (SELECT doc_id, len(gs) AS sz FROM g WHERE len(gs) > 0),
            post AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE len(gs) > 0),
            cand AS (SELECT p1.doc_id AS doc_a, p2.doc_id AS doc_b,
                            CAST(count(*) AS BIGINT) AS inter
                     FROM post p1 JOIN post p2
                       ON p1.gram = p2.gram AND p1.doc_id < p2.doc_id
                     GROUP BY 1, 2)
            SELECT doc_a, doc_b, jaccard FROM (
              SELECT c.doc_a, c.doc_b,
                     round(CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter), 6) AS jaccard
              FROM cand c JOIN s sa ON sa.doc_id = c.doc_a
                          JOIN s sb ON sb.doc_id = c.doc_b
            ) WHERE jaccard >= $t"""

  private[queries] val ngramJaccardOracle: String = ngramJaccardOracleAt("0.8")

  val q26MinhashLsh: QueryDef = QueryDef(
    "q26_minhash_lsh",
    (s, dir) => Dedup.minhashPairs(Tables.documents(s, dir)),
    Some(ngramJaccardOracle)
  )

  /** SimHash near-dup pairs, ORACLE-CHECKED: md5-derived bit votes with
    * the signature as 4 × 16-bit bands, so DuckDB replays the identical
    * signatures (votes → bands → bucket join → banded Hamming). The
    * xxhash64 compiled-kernel variant ([[Dedup.simhashPairs]]) is the
    * throughput path, pinned separately by KernelParitySpec + golden.
    */
  val q27SimhashPairs: QueryDef = QueryDef(
    "q27_simhash_pairs",
    (s, dir) => Dedup.simhashPairsMd5(Tables.documents(s, dir)),
    Some("""WITH toks AS (
              SELECT doc_id, t FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE t <> ''
            ),
            h AS (
              SELECT doc_id,
                     CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS hi,
                     CAST(('0x' || substring(md5(t), 9, 8)) AS BIGINT) AS lo
              FROM toks
            ),
            votes AS (
              SELECT doc_id, i,
                     sum(CASE WHEN ((CASE WHEN i < 32 THEN lo ELSE hi END)
                                    >> CAST(i % 32 AS INT)) & 1 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM h, range(0, 64) r(i)
              GROUP BY doc_id, i
            ),
            bands AS (
              SELECT doc_id, CAST(i // 16 AS INT) AS band_id,
                     CAST(sum(CASE WHEN v >= 0 THEN 1 << CAST(i % 16 AS INT)
                              ELSE 0 END) AS BIGINT) AS band_val
              FROM votes GROUP BY doc_id, i // 16
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
            ),
            ham AS (
              SELECT c.doc_a, c.doc_b,
                     CAST(sum(bit_count(xor(a.band_val, b.band_val))) AS INT) AS hamming
              FROM cand c
              JOIN bands a ON a.doc_id = c.doc_a
              JOIN bands b ON b.doc_id = c.doc_b AND b.band_id = a.band_id
              GROUP BY c.doc_a, c.doc_b
            )
            SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3""")
  )

  val q28NgramJaccard: QueryDef = QueryDef(
    "q28_ngram_jaccard",
    (s, dir) => Dedup.ppjoinPairs(Tables.documents(s, dir)),
    Some(ngramJaccardOracle)
  )

  /** Embedding near-dup, ORACLE-CHECKED end to end: md5-derived SRP
    * planes (exact 48-bit rational components — DuckDB reconstructs the
    * identical family from the plane-name strings), so candidate
    * generation AND exact-cosine verification replay in SQL. The
    * seeded-Gaussian variant ([[Dedup.embeddingNearDupPairs]]) remains
    * the production default, pinned by its own golden/parity specs.
    */
  val q29EmbedNeardup: QueryDef = QueryDef(
    "q29_embed_neardup",
    (s, dir) => Dedup.embeddingNearDupPairsMd5(Tables.embeddings(s, dir)),
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
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM sigs a JOIN sigs b
                ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
            SELECT id_a, id_b, cosine FROM (
              SELECT c.id_a, c.id_b,
                     round(${dotSql("a.embedding", "b.embedding")} /
                           (sqrt(${dotSql("a.embedding", "a.embedding")}) *
                            sqrt(${dotSql("b.embedding", "b.embedding")})), 6) AS cosine
              FROM cand c
              JOIN embeddings a ON a.vec_id = c.id_a
              JOIN embeddings b ON b.vec_id = c.id_b)
            WHERE cosine >= 0.30""")
  )

  val q30AnnBrute: QueryDef = QueryDef(
    "q30_ann_brute",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    Some(s"""SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(${dotSql("q.embedding", "c.embedding")} /
                           (sqrt(${dotSql("q.embedding", "q.embedding")}) *
                            sqrt(${dotSql("c.embedding", "c.embedding")})), 6) AS cosine,
                     row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       round(${dotSql("q.embedding", "c.embedding")} /
                             (sqrt(${dotSql("q.embedding", "q.embedding")}) *
                              sqrt(${dotSql("c.embedding", "c.embedding")})), 6) DESC,
                       c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
              WHERE q.vec_id < 10
            ) WHERE rank <= 5""")
  )

  /** LSH ANN, ORACLE-CHECKED end to end: md5-derived SRP planes (the q29
    * family at 8×6 geometry) make the bucket join itself SQL-replayable —
    * DuckDB rebuilds the hyperplanes, hashes corpus + probes, joins
    * same-signature buckets, and reranks by the exact cosine with the
    * identical (cosine DESC, neighbor_id ASC) tie-break. The
    * seeded-Gaussian [[Similarity.lshTopK]] stays the production default,
    * pinned by recall/golden specs.
    */
  val q31AnnLsh: QueryDef = QueryDef(
    "q31_ann_lsh",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopKMd5(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    Some(s"""WITH planes AS (
              SELECT t.t AS t, p.p AS p, k.k AS k,
                     (CAST(('0x' || substring(md5('srp|' || t.t || '|' || p.p || '|' || k.k),
                                              1, 12)) AS BIGINT)
                      - 140737488355328) / 140737488355328.0 AS w
              FROM range(0, 8) t(t), range(0, 6) p(p), range(0, 64) k(k)),
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
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM sigs q JOIN sigs c
                ON q.t = c.t AND q.sig = c.sig AND c.vec_id != q.vec_id
              WHERE q.vec_id < 10),
            scored AS (
              SELECT cd.query_id, cd.neighbor_id,
                     round(${dotSql("q.embedding", "c.embedding")} /
                           (sqrt(${dotSql("q.embedding", "q.embedding")}) *
                            sqrt(${dotSql("c.embedding", "c.embedding")})), 6) AS cosine
              FROM cand cd
              JOIN embeddings q ON q.vec_id = cd.query_id
              JOIN embeddings c ON c.vec_id = cd.neighbor_id)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored) WHERE rank <= 5""")
  )

  /** IVF ANN, ORACLE-CHECKED end to end INCLUDING TRAINING: the coarse
    * quantizer is deterministic (seeds = 16 lowest-id vectors, max-dot
    * Lloyd with 2^-20 grid-quantized means), so DuckDB replays the whole
    * index build — two training iterations, cell assignment, nprobe=4
    * probing — then the exact-cosine rerank with the identical tie-break.
    * This is q99's relational k-means replay extended through a full ANN
    * retrieval. Training-sample note: trainLimit=2000 ≥ corpus size at
    * every shipped SF, so `pts` is the whole table in both engines.
    */
  val q46AnnIvf: QueryDef = QueryDef(
    "q46_ann_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    Some(s"""WITH ${AnnReplaySql.preambleSql},
            ${AnnReplaySql.ivfModelSql(2)},
            cand AS (SELECT pr.query_id, a.vec_id AS neighbor_id
                     FROM probes pr
                     JOIN assign a ON a.cell = pr.cell AND a.vec_id != pr.query_id),
            ${AnnReplaySql.rerankSql(5)}""")
  )

  val q32TextQuality: QueryDef = QueryDef(
    "q32_text_quality",
    (s, dir) => TextAnalysis.qualityMetrics(Tables.documents(s, dir)),
    Some("""WITH m AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                     CAST(len(list_filter(string_split(text, ' '),
                       w -> w IN ('the','a','of','and','to','in','is','on','for','with')))
                       AS BIGINT) AS n_stopwords,
                     CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                       AS BIGINT) AS n_punct,
                     CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                       AS BIGINT) AS n_upper
              FROM documents)
            SELECT doc_id, n_chars, n_words,
                   round(CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words, 6) AS avg_word_len,
                   n_stopwords,
                   round(CAST(n_stopwords AS DOUBLE) / n_words, 6) AS stopword_ratio,
                   round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
                   round(CAST(n_upper AS DOUBLE) / n_chars, 6) AS upper_ratio,
                   round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                         least(CAST(n_stopwords AS DOUBLE) / n_words * 5.0, 1.0) * 0.4 +
                         (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.2,
                         6) AS quality_score
            FROM m""")
  )

  val q33TokenCount: QueryDef = QueryDef(
    "q33_token_count",
    (s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir)),
    Some("""SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens,
            CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
            round(CAST(length(text) AS DOUBLE) /
                  len(regexp_extract_all(text, '\w+|[^\w\s]')), 6) AS chars_per_token
            FROM documents""")
  )

  val q34LangId: QueryDef = QueryDef(
    "q34_langid",
    (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)),
    // Same marker profiles as TextAnalysis.LangProfiles; the CASE order
    // encodes the first-profile-wins tie-break. zh markers can't occur in
    // the ASCII corpus but are kept for shape parity (score 0).
    Some("""WITH s AS (
              SELECT doc_id, lang AS labeled_lang,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> x IN ('the','and','of','to','is','in','that','it'))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS s_en,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> x IN ('el','la','de','que','y','los','en','un'))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS s_es,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> x IN ('le','la','de','et','les','des','un','une'))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS s_fr,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> x IN ('der','die','und','das','ist','ein','nicht','mit'))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS s_de,
                0.0 AS s_zh
              FROM documents)
            SELECT doc_id, labeled_lang,
              CASE
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh'
              END AS predicted_lang,
              round(greatest(s_en, s_es, s_fr, s_de, s_zh), 6) AS lang_score
            FROM s""")
  )

  val q35Fingerprint: QueryDef = QueryDef(
    "q35_fingerprint",
    (s, dir) => {
      RollingHash64.register(s)
      Tables
        .documents(s, dir)
        .select(col("doc_id"), expr("rolling_hash64(text)").as("fingerprint"))
    },
    // The 64-bit wrapping fold, replicated in HUGEINT arithmetic: h stays
    // < 2⁶⁴ so h·1000003 + b < 2⁸⁴ fits HUGEINT; mod 2⁶⁴ per step, then
    // two's-complement back to signed BIGINT. ASCII corpus ⇒ codepoint ≡
    // UTF-8 byte.
    Some("""SELECT doc_id,
              CAST(CASE WHEN hu >= 9223372036854775808
                   THEN hu - 18446744073709551616 ELSE hu END AS BIGINT) AS fingerprint
            FROM (
              SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS HUGEINT),
                    [CAST(unicode(substr(text, i, 1)) AS HUGEINT)
                     FOR i IN range(1, length(text) + 1)]),
                  (acc, x) -> (acc * 1000003 + x) % 18446744073709551616
                ) AS hu
              FROM documents)""")
  )

  val q36MultimodalMeta: QueryDef = QueryDef(
    "q36_multimodal_meta",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
      Multimodal
        .decodeMeta(media)
        .withColumn("mean_byte", round(col("mean_byte"), 6))
    },
    Some("""WITH m AS (
              SELECT doc_id,
                     CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n,
                     unicode(substr(text, 1, 1)) AS first_byte,
                     [unicode(substr(text, i, 1))
                      FOR i IN range(1, length(text) + 1)] AS codes
              FROM documents)
            SELECT doc_id, n AS n_bytes,
                   CAST(64 + n % 577 AS INT) AS width,
                   CAST(64 + (n * 31 + first_byte) % 353 AS INT) AS height,
                   CAST(1 + n % 7 AS INT) AS n_frames,
                   round(CAST(list_sum(codes) AS DOUBLE) / n, 6) AS mean_byte
            FROM m""")
  )

  /** Frame sampling over the media payloads (video-pipeline explode
    * shape): every 2nd of the stub codec's n_frames contiguous frames,
    * with per-frame byte count and mean — arithmetic the oracle
    * replicates byte-for-byte (ASCII corpus ⇒ byte ≡ codepoint, as q36).
    */
  val q47FrameSample: QueryDef = QueryDef(
    "q47_frame_sample",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
      Multimodal
        .sampleFrames(media, stride = 2)
        .withColumn("frame_mean_byte", round(col("frame_mean_byte"), 6))
    },
    Some("""WITH m AS (
              SELECT doc_id, length(text) AS n,
                     [unicode(substr(text, i, 1))
                      FOR i IN range(1, length(text) + 1)] AS codes,
                     CAST(1 + length(text) % 7 AS INT) AS nf
              FROM documents)
            SELECT doc_id, CAST(j AS INT) AS frame_id,
                   CAST((j + 1) * n // nf - j * n // nf AS BIGINT) AS frame_bytes,
                   round(CASE WHEN (j + 1) * n // nf - j * n // nf > 0
                     THEN CAST(list_sum(codes[j * n // nf + 1 : (j + 1) * n // nf]) AS DOUBLE)
                          / ((j + 1) * n // nf - j * n // nf)
                     ELSE 0.0 END, 6) AS frame_mean_byte
            FROM m, (SELECT unnest([0, 2, 4, 6]) AS j) t
            WHERE j < nf""")
  )

  val q37EmbeddingStats: QueryDef = QueryDef(
    "q37_embedding_stats",
    (s, dir) => {
      import graft.functions.VectorOps
      Tables
        .embeddings(s, dir)
        .select(col("label"), VectorOps.norm(VectorOps.toDouble(col("embedding"))).as("nrm"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          round(avg("nrm"), 6).as("avg_norm"),
          round(min("nrm"), 6).as("min_norm"),
          round(max("nrm"), 6).as("max_norm")
        )
    },
    Some(s"""WITH n AS (
              SELECT label,
                     sqrt(${dotSql("embedding", "embedding")}) AS nrm
              FROM embeddings)
            SELECT label, count(*) AS n_vecs,
                   round(avg(nrm), 6) AS avg_norm,
                   round(min(nrm), 6) AS min_norm,
                   round(max(nrm), 6) AS max_norm
            FROM n GROUP BY label""")
  )

  /** End-to-end corpus preparation — the composition a training-data user
    * actually runs: exact-dedup keepers (min doc_id per content hash) ∩
    * quality gate ≥ 0.5, annotated with token counts. One semi join
    * against the keeper set — HINT-FREE: the keeper relation is one row
    * per distinct content, i.e. ≈corpus-sized on a mostly-unique lake,
    * so a forced broadcast would OOM the driver at 100×; AQE picks the
    * build side from actual sizes — plus the row-local metric
    * projections; no extra shuffle beyond the dedup aggregate.
    */
  val q53CorpusPrep: QueryDef = QueryDef(
    "q53_corpus_prep",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val keepers = Dedup
        .exactGroups(docs)
        .select(col("keep_id").as("doc_id"))
      val quality = TextAnalysis
        .qualityMetrics(docs)
        .select(col("doc_id"), col("quality_score"))
      val tokens = TextAnalysis
        .tokenCounts(docs)
        .select(col("doc_id"), col("n_tokens"))
      docs
        .join(keepers, Seq("doc_id"), "left_semi")
        .join(quality, "doc_id")
        .join(tokens, "doc_id")
        .filter(col("quality_score") >= 0.5)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"))
    },
    Some("""WITH keepers AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            m AS (
              SELECT doc_id, lang,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                     CAST(len(list_filter(string_split(text, ' '),
                       w -> w IN ('the','a','of','and','to','in','is','on','for','with')))
                       AS BIGINT) AS n_stopwords,
                     CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                       AS BIGINT) AS n_punct,
                     CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens
              FROM documents)
            SELECT m.doc_id, m.lang, m.n_tokens,
                   round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                         least(CAST(n_stopwords AS DOUBLE) / n_words * 5.0, 1.0) * 0.4 +
                         (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.2,
                         6) AS quality_score
            FROM m JOIN keepers USING (doc_id)
            WHERE round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                        least(CAST(n_stopwords AS DOUBLE) / n_words * 5.0, 1.0) * 0.4 +
                        (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.2,
                        6) >= 0.5""")
  )

  /** Corpus vocabulary table (tf / df / idf) — the IDF-build step of a
    * training-data pipeline, exact df via two-level partial aggregation.
    */
  val q55Vocab: QueryDef = QueryDef(
    "q55_vocab",
    (s, dir) => TextAnalysis.vocabStats(Tables.documents(s, dir)),
    Some("""WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT word, count(*) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                   round(ln(CAST(n_docs AS DOUBLE) / count(DISTINCT doc_id)), 6) AS idf
            FROM w, n
            WHERE len(word) > 0
            GROUP BY word, n_docs""")
  )

  /** Dedup clusters: connected components over the exact near-dup pair
    * graph, rolled up to (cluster_rep, size) — the keep-one-per-CLUSTER
    * decision a corpus dedup actually ships. Pairs come from the
    * MinHash-LSH pipeline (the one a 100 TB dedup would run; ≡ the exact
    * pair set on this corpus, see [[ngramJaccardOracle]]). Oracle:
    * recursive-CTE transitive closure over the quadratic pair set (min
    * reachable id ≡ min-label-propagation fixpoint).
    */
  val q58DedupClusters: QueryDef = QueryDef(
    "q58_dedup_clusters",
    (s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.documents(s, dir))
      Dedup
        .connectedComponents(pairs)
        .groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("cluster_size"))
    },
    Some(s"""WITH RECURSIVE pairs AS ($ngramJaccardOracle),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b AS u, doc_a AS v FROM pairs),
            reach AS (
              SELECT u AS doc, u AS label FROM edges
              UNION
              SELECT e.u AS doc, r.label
              FROM edges e JOIN reach r ON r.doc = e.v)
            SELECT CAST(min_label AS BIGINT) AS cluster_rep,
                   count(*) AS cluster_size
            FROM (SELECT doc, min(label) AS min_label FROM reach GROUP BY doc)
            GROUP BY 1""")
  )

  /** Same clusters as q58, computed by the LARGE-STAR/SMALL-STAR
    * contraction ([[Dedup.connectedComponentsStar]], O(log n) rounds —
    * the variant a 100 TB dedup with deep duplicate chains needs) against
    * the same recursive-CTE oracle: both component algorithms are now
    * oracle-checked, not just parity-checked against each other.
    */
  val q69DedupClustersStar: QueryDef = QueryDef(
    "q69_dedup_clusters_star",
    (s, dir) => {
      val pairs = Dedup.minhashPairs(Tables.documents(s, dir))
      Dedup
        .connectedComponentsStar(pairs)
        .groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("cluster_size"))
    },
    q58DedupClusters.oracle
  )

  /** Top-3 characteristic terms per document by TF-IDF, integer-only rank
    * order (tf desc, rare-first df, word) so both engines rank
    * identically; the tfidf payload mirrors the engine's double rounding
    * (idf rounded to 6, then the product rounded to 6).
    */
  val q56TfidfTop: QueryDef = QueryDef(
    "q56_tfidf_top",
    (s, dir) => TextAnalysis.tfidfTopTerms(Tables.documents(s, dir)),
    Some("""WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents),
            n AS (SELECT count(*) AS n_docs FROM documents),
            pd AS (SELECT doc_id, word, count(*) AS tf_doc
                   FROM w WHERE len(word) > 0 GROUP BY 1, 2),
            v AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                         round(ln(CAST(n_docs AS DOUBLE) / count(DISTINCT doc_id)), 6) AS idf
                  FROM w, n WHERE len(word) > 0 GROUP BY word, n_docs),
            s AS (SELECT pd.doc_id, pd.word, pd.tf_doc, v.df,
                         round(pd.tf_doc * v.idf, 6) AS tfidf,
                         row_number() OVER (PARTITION BY pd.doc_id
                           ORDER BY pd.tf_doc DESC, v.df ASC, pd.word ASC) AS rk
                  FROM pd JOIN v USING (word))
            SELECT doc_id, CAST(rk AS INT) AS rk, word, tf_doc, df, tfidf
            FROM s WHERE rk <= 3""")
  )

  /** Stable train/val/test assignment by identity hash (md5 bucket of
    * 1000 — reproducible across partitionings, engines, and corpus
    * growth, unlike seeded rand), rolled up per (split, lang) with an
    * id checksum so the oracle pins the exact membership, not just the
    * counts.
    */
  val q59HashSplit: QueryDef = QueryDef(
    "q59_hash_split",
    (s, dir) => {
      graft.operators.Sampling
        .hashSplit(Tables.documents(s, dir), "doc_id")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    },
    Some("""SELECT
              CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split,
              lang, count(*) AS n_docs,
              CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM (
              SELECT doc_id, lang,
                     CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8))
                          AS BIGINT) % 1000 AS b
              FROM documents)
            GROUP BY 1, 2""")
  )

  /** Gopher-style repetition quality rules: per-doc duplicate-word and
    * duplicate-trigram fractions, row-local via the distinct-shingle
    * kernel (the oracle rebuilds both fractions from string lists).
    */
  val q63Repetition: QueryDef = QueryDef(
    "q63_repetition",
    (s, dir) => TextAnalysis.repetitionMetrics(Tables.documents(s, dir)),
    Some("""WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     [array_to_string(string_split(text, ' ')[i:i+2], ' ')
                      FOR i IN range(1, len(string_split(text, ' ')) - 1)] AS gs
              FROM documents)
            SELECT doc_id,
                   CAST(len(ws) AS INT) AS n_words,
                   round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6)
                     AS dup_word_ratio,
                   CASE WHEN len(gs) = 0 THEN 0.0
                        ELSE round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 6)
                   END AS dup_3gram_ratio
            FROM t""")
  )

  /** Benchmark decontamination: corpus docs sharing >= 8 distinct word
    * trigrams with the held-out pseudo-benchmark (doc_id % 10 == 0) — the
    * docs a training run drops so it can't memorize its eval set. The
    * oracle joins on trigram STRINGS where the engine joins on xxhash64
    * shingle hashes: counts agree unless 64-bit hashes collide within a
    * doc pair (~1e-10 over this corpus).
    */
  val q62Decontam: QueryDef = QueryDef(
    "q62_decontam",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup
        .contaminatedDocs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0)
        )
        .select(col("doc_id"), col("n_shared").cast("long").as("n_shared"))
    },
    Some("""WITH g AS (
              SELECT doc_id,
                     list_distinct([array_to_string(string_split(text, ' ')[i:i+2], ' ')
                                    FOR i IN range(1, len(string_split(text, ' ')) - 1)]) AS gs
              FROM documents),
            b AS (SELECT DISTINCT unnest(gs) AS sh FROM g WHERE doc_id % 10 = 0),
            c AS (SELECT doc_id, unnest(gs) AS sh FROM g WHERE doc_id % 10 <> 0)
            SELECT doc_id, CAST(count(DISTINCT c.sh) AS BIGINT) AS n_shared
            FROM c JOIN b USING (sh)
            GROUP BY doc_id HAVING count(DISTINCT c.sh) >= 8""")
  )

  /** Sequence packing manifest: documents assigned in stable doc_id order
    * to ~512-token training chunks via the distributed prefix-sum (see
    * [[graft.operators.Packing]]); the oracle runs the naive global
    * cumulative sum the two-phase form must equal.
    */
  val q61Packing: QueryDef = QueryDef(
    "q61_packing",
    (s, dir) => graft.operators.Packing.packByTokenBudget(Tables.documents(s, dir)),
    Some("""WITH t AS (
              SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
            c AS (
              SELECT doc_id, tok,
                     sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
                       AS cum_excl
              FROM t)
            SELECT CAST(cum_excl // 512 AS BIGINT) AS chunk_id,
                   count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS n_tokens,
                   min(doc_id) AS first_doc,
                   max(doc_id) AS last_doc
            FROM c GROUP BY 1""")
  )

  /** Corpus rebalancing by STRATIFIED deterministic sampling: per-language
    * keep rates (downsample dominant en to 40%, keep rarer langs at
    * 80-100%) as a row-local hash filter — no shuffle, stable under
    * reprocessing. The oracle pins exact membership via the md5-bucket
    * parity of q59.
    */
  val q67StratifiedSample: QueryDef = QueryDef(
    "q67_stratified_sample",
    (s, dir) => {
      graft.operators.Sampling
        .stratifiedSample(
          Tables.documents(s, dir),
          strataCol = "lang",
          idCol = "doc_id",
          perMilleByStratum = Map("en" -> 400, "de" -> 800, "zh" -> 1000),
          defaultPerMille = 600)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"),
          sum(col("n_chars")).cast("long").as("chars_kept"))
    },
    Some("""SELECT lang, count(*) AS n_kept,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum,
                   CAST(sum(n_chars) AS BIGINT) AS chars_kept
            FROM (
              SELECT lang, doc_id, n_chars,
                     CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8))
                          AS BIGINT) % 1000 AS b
              FROM documents)
            WHERE b < (CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 800
                       WHEN 'zh' THEN 1000 ELSE 600 END)
            GROUP BY lang""")
  )

  val all: Seq[QueryDef] = Seq(
    q25DedupExact, q26MinhashLsh, q27SimhashPairs, q28NgramJaccard,
    q29EmbedNeardup, q30AnnBrute, q31AnnLsh, q32TextQuality, q33TokenCount,
    q34LangId, q35Fingerprint, q36MultimodalMeta, q37EmbeddingStats, q46AnnIvf,
    q47FrameSample, q53CorpusPrep, q55Vocab, q56TfidfTop, q58DedupClusters,
    q59HashSplit, q61Packing, q62Decontam, q63Repetition, q67StratifiedSample,
    q69DedupClustersStar
  )
}
