package graft.queries

/** DuckDB SQL builders for the ANN-index REPLAY oracles (q46/q80/q123):
  * the index builds in [[graft.operators.Similarity]] are deterministic —
  * strided/lowest-id seeds, positional dot/norm folds, 2^-20
  * grid-quantized Lloyd means — so a SQL engine reconstructs the exact
  * quantizers and codebooks and replays retrieval end to end.
  *
  * Parity rules these builders encode (established by q99 and the q29/q31
  * md5-plane oracles):
  *   - per-element folds are list comprehensions (`[... FOR i IN range]`),
  *     an ORDERED fold bit-identical to the JVM's index loop — never a
  *     GROUP BY sum, whose reduction order is engine-chosen;
  *   - the one unavoidable GROUP BY (per-cell means) is snapped to the
  *     2^-20 binary grid on both engines, absorbing reduction-order ulps;
  *   - strict `>`/`<` argmax/argmin keeps the EARLIEST winner on exact
  *     ties ≡ `ORDER BY score, cid`;
  *   - emptied cells keep their previous centroid ≡ `coalesce` against
  *     the previous iteration's values.
  */
object AnnReplaySql {

  /** Positional 64-dim dot fold over already-double lists. */
  def dot64(a: String, b: String): String =
    s"list_sum([$a[i] * $b[i] FOR i IN range(1, 65)])"

  /** Positional dsub=8 sub-vector dot fold. */
  def dotSub(a: String, b: String): String =
    s"list_sum([$a[i] * $b[i] FOR i IN range(1, 9)])"

  /** Positional dsub=8 squared-L2 fold. */
  def d2Sub(a: String, b: String): String =
    s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) FOR i IN range(1, 9)])"

  /** One coarse-quantizer Lloyd iteration (full 64-dim, max-dot against
    * L2-normalized centroids), `pts(vec_id, v)` in scope. Emits CTEs
    * `$nn` (normalized prev), `d_$an` (dots), `$an` (assignment), `$mn`
    * (grid-quantized means), `$cn` (next centroids).
    */
  def kmeansIterSql(cn: String, prev: String, an: String, mn: String, nn: String): String =
    s"""$nn AS (SELECT cid, list_transform(c, x -> x / sqrt(${dot64("c", "c")})) AS nc
               FROM $prev),
       d_$an AS (SELECT p.vec_id, n.cid, ${dot64("p.v", "n.nc")} AS dt
                 FROM pts p CROSS JOIN $nn n),
       $an AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                   ORDER BY dt DESC, cid) AS rn
                 FROM d_$an) WHERE rn = 1),
       $mn AS (SELECT $an.cid, pos,
                      floor(sum(val) / count(*) * 1048576.0) / 1048576.0 AS m
               FROM $an JOIN (SELECT vec_id, generate_subscripts(v, 1) AS pos,
                                     unnest(v) AS val
                              FROM pts) e USING (vec_id)
               GROUP BY $an.cid, pos),
       $cn AS (SELECT ce.cid, list(coalesce($mn.m, ce.val) ORDER BY ce.pos) AS c
               FROM (SELECT cid, generate_subscripts(c, 1) AS pos, unnest(c) AS val
                     FROM $prev) ce
               LEFT JOIN $mn ON $mn.cid = ce.cid AND $mn.pos = ce.pos
               GROUP BY ce.cid)"""

  /** One PQ-codebook Lloyd iteration over ALL m=8 subspaces at once
    * (subspace id `s` is just another key column; min-L2 assignment),
    * `subpts(vec_id, s, sv)` in scope. Emits `d_$an`, `$an`, `$mn`, `$cn`.
    */
  def pqIterSql(cn: String, prev: String, an: String, mn: String): String =
    s"""d_$an AS (SELECT p.vec_id, p.s, c.cid, ${d2Sub("p.sv", "c.c")} AS d2
                  FROM subpts p JOIN $prev c ON c.s = p.s),
       $an AS (SELECT vec_id, s, cid FROM (
                 SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id, s
                   ORDER BY d2 ASC, cid ASC) AS rn
                 FROM d_$an) WHERE rn = 1),
       $mn AS (SELECT $an.s, $an.cid, e.pos,
                      floor(sum(e.val) / count(*) * 1048576.0) / 1048576.0 AS m
               FROM $an JOIN (SELECT vec_id, s, generate_subscripts(sv, 1) AS pos,
                                     unnest(sv) AS val
                              FROM subpts) e USING (vec_id, s)
               GROUP BY $an.s, $an.cid, e.pos),
       $cn AS (SELECT ce.s, ce.cid, list(coalesce($mn.m, ce.val) ORDER BY ce.pos) AS c
               FROM (SELECT s, cid, generate_subscripts(c, 1) AS pos, unnest(c) AS val
                     FROM $prev) ce
               LEFT JOIN $mn ON $mn.s = ce.s AND $mn.cid = ce.cid AND $mn.pos = ce.pos
               GROUP BY ce.s, ce.cid)"""

  /** Shared preamble: doubles view, strided-seed params, subspace split. */
  val preambleSql: String =
    s"""pts AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       n_tot AS (SELECT greatest(1, count(*) // 16) AS stride, count(*) AS n FROM pts),
       subpts AS (
         SELECT vec_id, s.s AS s, v[s.s * 8 + 1 : s.s * 8 + 8] AS sv
         FROM pts, range(0, 8) s(s))"""

  /** PQ codebook build (b0 seeds + `iters` Lloyd iterations → `$last`),
    * plus corpus `codes`, codebook `norms`/`nlist`, and query `luts`
    * against codebook `$last` — everything the ADC fold consumes.
    */
  def pqModelSql(iters: Int): String = {
    val names = (0 to iters).map(i => s"b$i")
    val steps = (1 to iters)
      .map(i => pqIterSql(names(i), names(i - 1), s"a$i", s"m$i"))
      .mkString(",\n")
    val last = names.last
    s"""b0 AS (
         SELECT sp.s, c.c AS cid, sp.sv AS c
         FROM range(0, 16) c(c), n_tot, subpts sp
         WHERE sp.vec_id = (c.c * n_tot.stride) % n_tot.n),
       $steps,
       enc_d AS (SELECT p.vec_id, p.s, c.cid, ${d2Sub("p.sv", "c.c")} AS d2
                 FROM subpts p JOIN $last c ON c.s = p.s),
       codes AS (SELECT vec_id, list(cid ORDER BY s) AS codes FROM (
                   SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id, s
                     ORDER BY d2 ASC, cid ASC) AS rn
                   FROM enc_d) WHERE rn = 1 GROUP BY vec_id),
       norms AS (SELECT s, cid, ${dotSub("c", "c")} AS n2 FROM $last),
       nlist AS (SELECT list(n2 ORDER BY s, cid) AS nl FROM norms),
       luts AS (SELECT q.vec_id AS query_id,
                       list(dt ORDER BY s, cid) AS lut,
                       sqrt(${dot64("any_value(q2.v)", "any_value(q2.v)")}) AS qn
                FROM (SELECT sp.vec_id, sp.s, b.cid, ${dotSub("sp.sv", "b.c")} AS dt
                      FROM subpts sp JOIN $last b ON b.s = sp.s
                      WHERE sp.vec_id < 10) q
                JOIN pts q2 ON q2.vec_id = q.vec_id
                GROUP BY q.vec_id)"""
  }

  /** The ADC approximate-cosine ORDERED fold over the subspace axis for a
    * `codes` column `$codes`, against `luts` row `l` and `nlist` row `n`.
    */
  def adcFold(codes: String): String =
    s"""list_sum([l.lut[(s - 1) * 16 + $codes[s] + 1] FOR s IN range(1, 9)]) /
       (l.qn * sqrt(list_sum([n.nl[(s - 1) * 16 + $codes[s] + 1] FOR s IN range(1, 9)])))"""

  /** Coarse-quantizer build (c0 seeds + `iters` iterations), final
    * normalized centroids `nf`, all-corpus dots `df`, one-cell `assign`,
    * and nprobe=4 `probes` for the queries selected by `probePred`
    * (default: the q46/q80/q123 probe set, vec_id < 10; q390's
    * corpus-scale mutual-NN passes TRUE so every vector probes).
    */
  def ivfModelSql(iters: Int, probePred: String = "vec_id < 10"): String = {
    val names = (0 to iters).map(i => s"c$i")
    val steps = (1 to iters)
      .map(i => kmeansIterSql(names(i), names(i - 1), s"ka$i", s"km$i", s"n${i - 1}"))
      .mkString(",\n")
    val last = names.last
    s"""c0 AS (SELECT vec_id AS cid, v AS c FROM pts WHERE vec_id < 16),
       $steps,
       nf AS (SELECT cid, list_transform(c, x -> x / sqrt(${dot64("c", "c")})) AS nc
              FROM $last),
       df AS (SELECT p.vec_id, n.cid, ${dot64("p.v", "n.nc")} AS dt
              FROM pts p CROSS JOIN nf n),
       assign AS (SELECT vec_id, cid AS cell FROM (
                    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                      ORDER BY dt DESC, cid) AS rn
                    FROM df) WHERE rn = 1),
       probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
                    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                      ORDER BY dt DESC, cid) AS rn
                    FROM df WHERE $probePred) WHERE rn <= 4)"""
  }

  /** Multi-probe SRP-LSH replay ([[graft.functions.SrpMultiProbe]]):
    * md5 plane family, base signatures for the corpus, base + (nprobe−1)
    * lowest-|dot| single-bit perturbations for queries vec_id < 10, and
    * the deduped candidate bucket join → `cand(query_id, neighbor_id)`.
    * Every dot is the ordered 64-term list fold (bit-identical to the
    * kernel's JVM loop); the bit flip is the arithmetic ±2^p (engine-
    * neutral, no XOR builtin needed).
    */
  def multiProbeLshSql(tables: Int, planesPerTable: Int, nprobe: Int): String =
    s"""mp_comp AS (
         SELECT t.range AS t, p.range AS p, k.range AS k,
                (CAST(('0x' || substring(md5('srp|' || CAST(t.range AS VARCHAR) || '|'
                      || CAST(p.range AS VARCHAR) || '|' || CAST(k.range AS VARCHAR)),
                      1, 12)) AS BIGINT) - 140737488355328)
                  / CAST(140737488355328 AS DOUBLE) AS comp
         FROM range(0, $tables) t
         CROSS JOIN range(0, $planesPerTable) p
         CROSS JOIN range(0, 64) k),
       mp_pl AS (SELECT t, p, list(comp ORDER BY k) AS pl
                 FROM mp_comp GROUP BY 1, 2),
       mp_dots AS (
         SELECT v.vec_id, pl.t, pl.p,
                list_sum([v.v[i] * pl.pl[i] FOR i IN range(1, 65)]) AS d
         FROM pts v CROSS JOIN mp_pl pl),
       mp_sig AS (
         SELECT vec_id, t,
                CAST(sum(CASE WHEN d >= 0
                              THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
         FROM mp_dots GROUP BY 1, 2),
       mp_rank AS (
         SELECT vec_id, t, p, d,
                row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(d), p) AS rn
         FROM mp_dots WHERE vec_id < 10),
       mp_probes AS (
         SELECT vec_id AS query_id, t, sig AS probe
         FROM mp_sig WHERE vec_id < 10
         UNION ALL
         SELECT r.vec_id, r.t,
                s.sig + CASE WHEN r.d >= 0
                             THEN -(CAST(1 AS BIGINT) << r.p)
                             ELSE (CAST(1 AS BIGINT) << r.p) END
         FROM mp_rank r JOIN mp_sig s ON s.vec_id = r.vec_id AND s.t = r.t
         WHERE r.rn <= ${nprobe - 1}),
       cand AS (
         SELECT DISTINCT pr.query_id, cs.vec_id AS neighbor_id
         FROM mp_probes pr
         JOIN mp_sig cs ON cs.t = pr.t AND cs.sig = pr.probe
                       AND cs.vec_id != pr.query_id)"""

  /** Exact-cosine rerank of `cand(query_id, neighbor_id)` to top-k with
    * the (cosine DESC, neighbor_id ASC) tie-break.
    */
  def rerankSql(k: Int): String =
    s"""scored AS (
         SELECT cd.query_id, cd.neighbor_id,
                round(${dot64("q.v", "c.v")} /
                      (sqrt(${dot64("q.v", "q.v")}) * sqrt(${dot64("c.v", "c.v")})), 6) AS cosine
         FROM cand cd
         JOIN pts q ON q.vec_id = cd.query_id
         JOIN pts c ON c.vec_id = cd.neighbor_id)
       SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rank
         FROM scored) WHERE rank <= $k"""
}
