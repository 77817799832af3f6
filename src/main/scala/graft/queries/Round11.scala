package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 additions (q380+): a TPC-H-shaped DECORRELATION suite —
  * the classic warehouse query shapes (min-cost supplier, top-revenue
  * supplier, dominant-supplier inventory, lone-late supplier,
  * dormant-prospect segments) adapted to this lake's schema (no
  * partsupp/phone/receiptdate columns; the supply catalog derives from
  * lineitem, country codes from key residues, lateness from
  * ship-vs-order dates). Every query leans on a different correlated
  * form Catalyst must decorrelate (scalar-agg subquery, uncorrelated
  * max, correlated IN with group-threshold, EXISTS/NOT-EXISTS pair,
  * anti join + scalar average) — the plans land as joins against
  * broadcast/keyed aggregates, never per-row re-execution (q89's plan
  * audit generalizes). Money stays in exact integer cents end to end.
  */
object Round11 {

  private def views(s: org.apache.spark.sql.SparkSession, dir: String, ts: Seq[String]): Unit =
    ts.foreach {
      case "lineitem" => Tables.lineitem(s, dir).createOrReplaceTempView("r11_lineitem")
      case "orders"   => Tables.orders(s, dir).createOrReplaceTempView("r11_orders")
      case "customer" => Tables.customer(s, dir).createOrReplaceTempView("r11_customer")
      case "supplier" => Tables.supplier(s, dir).createOrReplaceTempView("r11_supplier")
      case "part"     => Tables.part(s, dir).createOrReplaceTempView("r11_part")
      case "nation"   => Tables.nation(s, dir).createOrReplaceTempView("r11_nation")
      case "region"   => Tables.region(s, dir).createOrReplaceTempView("r11_region")
      case "events"   => Tables.events(s, dir).createOrReplaceTempView("r11_events")
    }

  /** TPC-H Q2 shape: for every ECONOMY part, the region-0 supplier(s)
    * offering the minimum observed unit cost — a correlated scalar-agg
    * subquery over the lineitem-derived supply catalog that Catalyst
    * decorrelates into a per-part min aggregate joined back (one keyed
    * agg + two hash joins at any scale; the region dimension
    * broadcasts).
    */
  val q380MinCostSupplier: QueryDef = QueryDef(
    "q380_min_cost_supplier",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "supplier", "part", "nation"))
      s.sql("""
        WITH supply AS (
          SELECT l_partkey pk, l_suppkey sk,
                 CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) cst
          FROM r11_lineitem GROUP BY 1, 2),
        rs AS (
          SELECT s_suppkey, s_name, n_name
          FROM r11_supplier JOIN r11_nation ON s_nationkey = n_nationkey
          WHERE n_regionkey = 0)
        SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey,
               CAST(rs.s_suppkey AS BIGINT) AS s_suppkey,
               rs.n_name AS n_name, sup.cst AS cost_cents
        FROM r11_part p
        JOIN supply sup ON sup.pk = p.p_partkey
        JOIN rs ON rs.s_suppkey = sup.sk
        WHERE p.p_type = 'ECONOMY'
          AND sup.cst = (SELECT min(s2.cst) FROM supply s2
                          JOIN rs r2 ON r2.s_suppkey = s2.sk
                          WHERE s2.pk = p.p_partkey)
        ORDER BY p_partkey, s_suppkey""")
    },
    Some("""WITH supply AS (
              SELECT l_partkey pk, l_suppkey sk,
                     CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) cst
              FROM lineitem GROUP BY 1, 2),
            rs AS (
              SELECT s_suppkey, s_name, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              WHERE n_regionkey = 0)
            SELECT CAST(p.p_partkey AS BIGINT) p_partkey,
                   CAST(rs.s_suppkey AS BIGINT) s_suppkey,
                   rs.n_name n_name, sup.cst cost_cents
            FROM part p
            JOIN supply sup ON sup.pk = p.p_partkey
            JOIN rs ON rs.s_suppkey = sup.sk
            WHERE p.p_type = 'ECONOMY'
              AND sup.cst = (SELECT min(s2.cst) FROM supply s2
                              JOIN rs r2 ON r2.s_suppkey = s2.sk
                              WHERE s2.pk = p.p_partkey)
            ORDER BY p_partkey, s_suppkey""")
  )

  /** TPC-H Q15 shape: supplier(s) with the maximum Q1-1995 discounted
    * revenue. Revenue is the exact integer cents×percent product
    * (price_cents · (100 − disc_pct)), so the max-equality predicate
    * never compares floats; the uncorrelated max subquery becomes a
    * broadcast single-row join.
    */
  val q381TopSupplier: QueryDef = QueryDef(
    "q381_top_supplier",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "supplier"))
      s.sql("""
        WITH rev AS (
          SELECT l_suppkey sk,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                          (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                   total_rev
          FROM r11_lineitem
          WHERE to_date(l_shipdate) >= DATE '1995-01-01'
            AND to_date(l_shipdate) < DATE '1995-04-01'
          GROUP BY 1)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name AS s_name,
               rev.total_rev AS total_rev
        FROM r11_supplier JOIN rev ON rev.sk = s_suppkey
        WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey""")
    },
    Some("""WITH rev AS (
              SELECT l_suppkey sk,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                              (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                       total_rev
              FROM lineitem
              WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
                AND CAST(l_shipdate AS DATE) < DATE '1995-04-01'
              GROUP BY 1)
            SELECT CAST(s_suppkey AS BIGINT) s_suppkey, s_name s_name,
                   rev.total_rev total_rev
            FROM supplier JOIN rev ON rev.sk = s_suppkey
            WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
            ORDER BY s_suppkey""")
  )

  /** TPC-H Q20 shape: suppliers who DOMINATED the 1996 shipments of
    * some red part (shipped > 30% of that part's total, integer ×10/×3
    * cross-multiplication — no division). The correlated per-part
    * total decorrelates into a part-keyed aggregate self-joined to the
    * supplier-part aggregate — both over the same filtered scan.
    */
  val q382DominantSupplier: QueryDef = QueryDef(
    "q382_dominant_supplier",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "supplier", "part"))
      s.sql("""
        WITH w AS (
          SELECT l_suppkey sk, l_partkey pk,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) q
          FROM r11_lineitem
          WHERE to_date(l_shipdate) >= DATE '1996-01-01'
            AND to_date(l_shipdate) < DATE '1997-01-01'
            AND l_partkey IN (SELECT p_partkey FROM r11_part WHERE p_name LIKE 'red%')
          GROUP BY 1, 2)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name AS s_name
        FROM r11_supplier
        WHERE s_suppkey IN (
          SELECT w1.sk FROM w w1
          WHERE w1.q * 10 > 3 * (SELECT sum(w2.q) FROM w w2 WHERE w2.pk = w1.pk))
        ORDER BY s_suppkey""")
    },
    Some("""WITH w AS (
              SELECT l_suppkey sk, l_partkey pk,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) q
              FROM lineitem
              WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              GROUP BY 1, 2)
            SELECT CAST(s_suppkey AS BIGINT) s_suppkey, s_name s_name
            FROM supplier
            WHERE s_suppkey IN (
              SELECT w1.sk FROM w w1
              WHERE w1.q * 10 > 3 * (SELECT sum(w2.q) FROM w w2 WHERE w2.pk = w1.pk))
            ORDER BY s_suppkey""")
  )

  /** TPC-H Q21 shape: the LONE-LATE supplier — in multi-supplier
    * orders, the supplier who shipped > 60 days after order placement
    * while every other supplier shipped on time; top 20 by incident
    * count. The EXISTS / NOT-EXISTS pair over the per-(order, supplier)
    * lateness relation compiles to one semi and one anti hash join on
    * the order key — the quadratic-looking predicate never leaves the
    * keyed join.
    */
  val q383LoneLateSupplier: QueryDef = QueryDef(
    "q383_lone_late_supplier",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "orders", "supplier"))
      s.sql("""
        WITH l1 AS (
          SELECT l_orderkey ok, l_suppkey sk,
                 max(CASE WHEN to_date(l_shipdate) > date_add(to_date(o_orderdate), 60)
                          THEN 1 ELSE 0 END) late
          FROM r11_lineitem JOIN r11_orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name AS s_name,
               CAST(count(*) AS BIGINT) AS numwait
        FROM l1 JOIN r11_supplier ON l1.sk = s_suppkey
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM l1 o WHERE o.ok = l1.ok AND o.sk <> l1.sk)
          AND NOT EXISTS (SELECT 1 FROM l1 o2
                          WHERE o2.ok = l1.ok AND o2.sk <> l1.sk AND o2.late = 1)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20""")
    },
    Some("""WITH l1 AS (
              SELECT l_orderkey ok, l_suppkey sk,
                     max(CASE WHEN CAST(l_shipdate AS DATE) >
                                   CAST(o_orderdate AS DATE) + 60
                              THEN 1 ELSE 0 END) late
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1, 2)
            SELECT CAST(s_suppkey AS BIGINT) s_suppkey, s_name s_name,
                   CAST(count(*) AS BIGINT) numwait
            FROM l1 JOIN supplier ON l1.sk = s_suppkey
            WHERE l1.late = 1
              AND EXISTS (SELECT 1 FROM l1 o WHERE o.ok = l1.ok AND o.sk <> l1.sk)
              AND NOT EXISTS (SELECT 1 FROM l1 o2
                              WHERE o2.ok = l1.ok AND o2.sk <> l1.sk AND o2.late = 1)
            GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey
            LIMIT 20""")
  )

  /** TPC-H Q22 shape: dormant high-balance prospects — customers in
    * "country codes" (key residue mod 7 ∈ {1,3,5}) with no FULFILLED
    * ('F'-status) order and a
    * balance above the positive-balance average of those codes. The
    * average compares as the exact cross-multiplication bal·n > sum
    * (never a float average), the order check is an anti join, and the
    * one-row (sum, n) aggregate broadcasts.
    */
  val q384DormantProspects: QueryDef = QueryDef(
    "q384_dormant_prospects",
    (s, dir) => {
      views(s, dir, Seq("customer", "orders"))
      s.sql("""
        WITH pos AS (
          SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) s,
                 CAST(count(*) AS BIGINT) n
          FROM r11_customer
          WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
        SELECT cc, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal) AS BIGINT) AS totacctbal_cents
        FROM (
          SELECT CAST(c_custkey % 7 AS BIGINT) cc,
                 CAST(round(c_acctbal * 100) AS BIGINT) bal
          FROM r11_customer, pos
          WHERE c_custkey % 7 IN (1, 3, 5)
            AND CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
            AND NOT EXISTS (SELECT 1 FROM r11_orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'))
        GROUP BY 1 ORDER BY 1""")
    },
    Some("""WITH pos AS (
              SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) s,
                     CAST(count(*) AS BIGINT) n
              FROM customer
              WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
            SELECT cc, CAST(count(*) AS BIGINT) numcust,
                   CAST(sum(bal) AS BIGINT) totacctbal_cents
            FROM (
              SELECT CAST(c_custkey % 7 AS BIGINT) cc,
                     CAST(round(c_acctbal * 100) AS BIGINT) bal
              FROM customer, pos
              WHERE c_custkey % 7 IN (1, 3, 5)
                AND CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_orderstatus = 'F'))
            GROUP BY 1 ORDER BY 1""")
  )

  /** Herfindahl–Hirschman market concentration per supplier nation:
    * HHI = Σ share² over each nation's supplier revenue shares, with
    * revenue in exact cents×percent integers and the squares
    * accumulated in decimal(38,0) (≈10²⁶ per supplier never wraps).
    * One keyed agg per level; the per-nation totals relation is
    * dimension-sized and joins broadcast.
    */
  val q385HhiConcentration: QueryDef = QueryDef(
    "q385_hhi_concentration",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "supplier"))
      s.sql("""
        WITH rev AS (
          SELECT s_nationkey nk, l_suppkey sk,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                          (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS DECIMAL(38,0)) r
          FROM r11_lineitem JOIN r11_supplier ON l_suppkey = s_suppkey
          GROUP BY 1, 2),
        tot AS (
          SELECT nk, CAST(sum(r) AS DECIMAL(38,0)) t,
                 CAST(count(*) AS BIGINT) n_suppliers,
                 CAST(max(r) AS DECIMAL(38,0)) mx
          FROM rev GROUP BY 1)
        SELECT CAST(r.nk AS BIGINT) AS nation,
               max(t.n_suppliers) AS n_suppliers,
               round(CAST(sum(r.r * r.r) AS DOUBLE) /
                     (CAST(max(t.t) AS DOUBLE) * CAST(max(t.t) AS DOUBLE)), 6) AS hhi,
               round(CAST(max(t.mx) AS DOUBLE) / CAST(max(t.t) AS DOUBLE), 6) AS top_share
        FROM rev r JOIN tot t ON r.nk = t.nk
        GROUP BY 1 ORDER BY 1""")
    },
    Some("""WITH rev AS (
              SELECT s_nationkey nk, l_suppkey sk,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                              (100 - CAST(round(l_discount * 100) AS BIGINT)))
                          AS HUGEINT) r
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2),
            tot AS (
              SELECT nk, CAST(sum(r) AS HUGEINT) t,
                     CAST(count(*) AS BIGINT) n_suppliers,
                     CAST(max(r) AS HUGEINT) mx
              FROM rev GROUP BY 1)
            SELECT CAST(r.nk AS BIGINT) nation,
                   max(t.n_suppliers) n_suppliers,
                   round(CAST(sum(r.r * r.r) AS DOUBLE) /
                         (CAST(max(t.t) AS DOUBLE) * CAST(max(t.t) AS DOUBLE)), 6) hhi,
                   round(CAST(max(t.mx) AS DOUBLE) / CAST(max(t.t) AS DOUBLE), 6) top_share
            FROM rev r JOIN tot t ON r.nk = t.nk
            GROUP BY 1 ORDER BY 1""")
  )

  /** Shuffle-skew advisor — the engine-ops report behind q104's salted
    * join: per-key row counts for two real join keys, the max-key share
    * and skew ratio (max/mean), and the salt factor that would spread
    * the hottest key across a 32-partition shuffle
    * (⌈32·max/total⌉, integer arithmetic). One keyed agg per key; the
    * per-key relation never leaves the aggregate.
    */
  val q386SkewAdvisor: QueryDef = QueryDef(
    "q386_skew_advisor",
    (s, dir) => {
      views(s, dir, Seq("lineitem", "orders"))
      s.sql("""
        WITH ko AS (SELECT o_custkey k, CAST(count(*) AS BIGINT) c
                    FROM r11_orders GROUP BY 1),
        kl AS (SELECT l_partkey k, CAST(count(*) AS BIGINT) c
               FROM r11_lineitem GROUP BY 1),
        st AS (
          SELECT 'lineitem.l_partkey' AS join_key, CAST(count(*) AS BIGINT) n_keys,
                 CAST(sum(c) AS BIGINT) n_rows, CAST(max(c) AS BIGINT) max_rows
          FROM kl
          UNION ALL
          SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT),
                 CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT)
          FROM ko)
        SELECT join_key, n_keys, n_rows, max_rows,
               round(CAST(max_rows AS DOUBLE) * n_keys / n_rows, 6) AS skew_ratio,
               CAST((max_rows * 32 + n_rows - 1) DIV n_rows AS BIGINT) AS suggested_salt
        FROM st ORDER BY join_key""")
    },
    Some("""WITH ko AS (SELECT o_custkey k, CAST(count(*) AS BIGINT) c
                        FROM orders GROUP BY 1),
            kl AS (SELECT l_partkey k, CAST(count(*) AS BIGINT) c
                   FROM lineitem GROUP BY 1),
            st AS (
              SELECT 'lineitem.l_partkey' join_key, CAST(count(*) AS BIGINT) n_keys,
                     CAST(sum(c) AS BIGINT) n_rows, CAST(max(c) AS BIGINT) max_rows
              FROM kl
              UNION ALL
              SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT),
                     CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT)
              FROM ko)
            SELECT join_key, n_keys, n_rows, max_rows,
                   round(CAST(max_rows AS DOUBLE) * n_keys / n_rows, 6) skew_ratio,
                   CAST((max_rows * 32 + n_rows - 1) // n_rows AS BIGINT) suggested_salt
            FROM st ORDER BY join_key""")
  )

  /** Zone-map (min/max statistics) skipping report: 1000-order "row
    * groups" carry ship-date min/max; a half-year predicate range is
    * checked against each group's bounds — groups whose range misses
    * the predicate entirely are SKIPPABLE without reading a row. The
    * report pairs the skip ratio with the true row selectivity (the gap
    * between them is the clustering quality the lake's Z-order write
    * exists to close). Day arithmetic is exact integers.
    */
  val q387ZoneMapSkip: QueryDef = QueryDef(
    "q387_zone_map_skip",
    (s, dir) => {
      views(s, dir, Seq("lineitem"))
      s.sql("""
        WITH rg AS (
          SELECT l_orderkey DIV 1000 g,
                 CAST(min(datediff(to_date(l_shipdate), DATE '1992-01-01')) AS BIGINT) lo,
                 CAST(max(datediff(to_date(l_shipdate), DATE '1992-01-01')) AS BIGINT) hi,
                 CAST(count(*) AS BIGINT) c,
                 CAST(sum(CASE WHEN to_date(l_shipdate) >= DATE '1996-01-01'
                                AND to_date(l_shipdate) < DATE '1996-07-01'
                               THEN 1 ELSE 0 END) AS BIGINT) sel
          FROM r11_lineitem GROUP BY 1),
        b AS (SELECT CAST(datediff(DATE '1996-01-01', DATE '1992-01-01') AS BIGINT) plo,
                     CAST(datediff(DATE '1996-07-01', DATE '1992-01-01') AS BIGINT) phi)
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_skipped,
               round(CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS skip_ratio,
               CAST(sum(sel) AS BIGINT) AS n_rows_selected,
               round(CAST(sum(sel) AS DOUBLE) / sum(c), 6) AS selectivity
        FROM rg, b""")
    },
    Some("""WITH rg AS (
              SELECT l_orderkey // 1000 g,
                     CAST(min(date_diff('day', DATE '1992-01-01',
                                        CAST(l_shipdate AS DATE))) AS BIGINT) lo,
                     CAST(max(date_diff('day', DATE '1992-01-01',
                                        CAST(l_shipdate AS DATE))) AS BIGINT) hi,
                     CAST(count(*) AS BIGINT) c,
                     CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                                    AND CAST(l_shipdate AS DATE) < DATE '1996-07-01'
                                   THEN 1 ELSE 0 END) AS BIGINT) sel
              FROM lineitem GROUP BY 1),
            b AS (SELECT CAST(date_diff('day', DATE '1992-01-01', DATE '1996-01-01')
                              AS BIGINT) plo,
                         CAST(date_diff('day', DATE '1992-01-01', DATE '1996-07-01')
                              AS BIGINT) phi)
            SELECT CAST(count(*) AS BIGINT) n_groups,
                   CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END) AS BIGINT)
                     n_skipped,
                   round(CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) skip_ratio,
                   CAST(sum(sel) AS BIGINT) n_rows_selected,
                   round(CAST(sum(sel) AS DOUBLE) / sum(c), 6) selectivity
            FROM rg, b""")
  )

  /** Join-cardinality estimator calibration: the optimizer's uniform
    * assumption |A⋈A| ≈ N²/ndv for the l_partkey self-join, against the
    * EXACT Σc² cardinality from the per-key histogram — the
    * underestimation factor IS the skew the uniform model misses
    * (cost-based join planning's classic failure). Everything is
    * integer until the final ratio.
    */
  val q388JoinCardCalibration: QueryDef = QueryDef(
    "q388_join_card_calibration",
    (s, dir) => {
      views(s, dir, Seq("lineitem"))
      s.sql("""
        WITH k AS (SELECT l_partkey, CAST(count(*) AS BIGINT) c
                   FROM r11_lineitem GROUP BY 1),
        st AS (SELECT CAST(sum(c) AS BIGINT) n, CAST(count(*) AS BIGINT) ndv,
                      CAST(sum(c * c) AS BIGINT) actual
               FROM k)
        SELECT n, ndv, actual,
               CAST((n * n) DIV ndv AS BIGINT) AS est_uniform,
               round(CAST(actual AS DOUBLE) * ndv / (CAST(n AS DOUBLE) * n), 6)
                 AS underestimation
        FROM st""")
    },
    Some("""WITH k AS (SELECT l_partkey, CAST(count(*) AS BIGINT) c
                       FROM lineitem GROUP BY 1),
            st AS (SELECT CAST(sum(c) AS BIGINT) n, CAST(count(*) AS BIGINT) ndv,
                          CAST(sum(c * c) AS BIGINT) actual
                   FROM k)
            SELECT n, ndv, actual,
                   CAST((n * n) // ndv AS BIGINT) est_uniform,
                   round(CAST(actual AS DOUBLE) * ndv / (CAST(n AS DOUBLE) * n), 6)
                     underestimation
            FROM st""")
  )

  /** Rendezvous (highest-random-weight) hashing: every user keys to the
    * node with the max md5(user:node) weight — the consistent data
    * placement scheme whose per-node load this report audits (share per
    * node, all within ~1/8 by construction). The argmax is a keyed
    * window over an 8-way scan-side fan — no shuffle beyond the final
    * count. The md5 weights are the engine's cross-replayable hash
    * contract, so the oracle reassigns every user identically.
    */
  val q389RendezvousHash: QueryDef = QueryDef(
    "q389_rendezvous_hash",
    (s, dir) => {
      views(s, dir, Seq("events"))
      s.sql("""
        WITH u AS (SELECT DISTINCT user_id FROM r11_events),
        t AS (SELECT CAST(count(*) AS BIGINT) n_total FROM u),
        a AS (
          SELECT user_id, node,
                 row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':',
                                      CAST(node AS STRING))), 1, 12),
                               16, 10) AS BIGINT) DESC, node ASC) rn
          FROM u
          LATERAL VIEW explode(sequence(0, 7)) nx AS node)
        SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS n_users,
               round(CAST(count(*) AS DOUBLE) / max(t.n_total), 6) AS load_share
        FROM a, t WHERE rn = 1
        GROUP BY 1 ORDER BY 1""")
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
            t AS (SELECT CAST(count(*) AS BIGINT) n_total FROM u),
            a AS (
              SELECT user_id, nx.range AS node,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':'
                                    || CAST(nx.range AS VARCHAR)), 1, 12)) AS BIGINT) DESC,
                                nx.range ASC) rn
              FROM u CROSS JOIN range(0, 8) nx)
            SELECT CAST(node AS BIGINT) node, CAST(count(*) AS BIGINT) n_users,
                   round(CAST(count(*) AS DOUBLE) / max(t.n_total), 6) AS load_share
            FROM a, t WHERE rn = 1
            GROUP BY 1 ORDER BY 1""")
  )

  /** Mutual nearest neighbors over the embedding corpus: pairs that are
    * each other's top-1 cosine neighbor — the reciprocal-NN criterion
    * semantic dedup and cross-lingual mining use to cut asymmetric
    * false matches. Composes [[graft.operators.Similarity.bruteTopK]]
    * at k=1 (the calibration baseline; at corpus scale the same
    * downstream join runs off ivfTopK's candidate sets) with a
    * self-join on the reciprocity condition.
    */
  val q390MutualNn: QueryDef = QueryDef(
    "q390_mutual_nn",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val top1 = graft.operators.Similarity.bruteTopK(emb, emb, k = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      top1.as("a")
        .join(
          top1.as("b"),
          col("a.query_id") === col("b.neighbor_id") &&
            col("a.neighbor_id") === col("b.query_id") &&
            col("a.query_id") < col("a.neighbor_id"))
        .select(
          col("a.query_id").cast("long").as("vec_a"),
          col("a.neighbor_id").cast("long").as("vec_b"),
          col("a.cosine").as("cosine"))
        .orderBy(col("vec_a"))
    },
    Some(s"""WITH scored AS (
              SELECT q.vec_id query_id, c.vec_id neighbor_id,
                     round(${LlmQueries.dotSql("q.embedding", "c.embedding")} /
                           (sqrt(${LlmQueries.dotSql("q.embedding", "q.embedding")}) *
                            sqrt(${LlmQueries.dotSql("c.embedding", "c.embedding")})), 6)
                       cosine
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id),
            top1 AS (
              SELECT query_id, neighbor_id, cosine FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) rank
                FROM scored)
              WHERE rank = 1)
            SELECT CAST(a.query_id AS BIGINT) vec_a,
                   CAST(a.neighbor_id AS BIGINT) vec_b, a.cosine cosine
            FROM top1 a JOIN top1 b
              ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
             AND a.query_id < a.neighbor_id
            ORDER BY 1""")
  )

  val all: Seq[QueryDef] =
    Seq(q380MinCostSupplier, q381TopSupplier, q382DominantSupplier,
      q383LoneLateSupplier, q384DormantProspects, q385HhiConcentration,
      q386SkewAdvisor, q387ZoneMapSkip, q388JoinCardCalibration,
      q389RendezvousHash, q390MutualNn)
}
