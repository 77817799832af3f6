package graft.queries

import org.apache.spark.sql.functions._

/** Round-65 additions (q612+): the DataSource V2 connector surface
  * ([[graft.sources.v2.GenTableProvider]], format `graft-gen`) — the one
  * planner path the catalogue had none of: a custom `Table`/`Scan` that
  * negotiates column pruning, exact filter pushdown, and plan-time
  * partition pruning with Catalyst (`BatchScan` in the physical plan,
  * like a parquet scan but with the engine's own pruning logic).
  *
  *   - q612: pushed id-range aggregate — the `WHERE id BETWEEN …` is
  *     absorbed by the scan (zero post-scan filter on id) and only the
  *     covering id splits are planned; Round65PropertySpec asserts the
  *     planned-partition count and the pruned read schema on the plan.
  *   - q613: residual-filter path — a category predicate the connector
  *     refuses stays a Spark-side Filter over the scan, composed with a
  *     pushed id bound; proves partial pushdown composes correctly.
  *
  * The connector's data is the engine's md5-dyadic seeded stream, so
  * both oracles replay the whole table from DuckDB `range(n)`
  * bit-for-bit — connector output equality is a hash fact, not a trust
  * assumption.
  */
object Round65 {

  private val Rows = 262144L
  private val Parts = 16
  private val Seed = 42L

  private def gen(s: org.apache.spark.sql.SparkSession, columnar: Boolean = false) =
    s.read
      .format("graft-gen")
      .option("rows", Rows)
      .option("partitions", Parts)
      .option("seed", Seed)
      .option("columnar", columnar)
      .load()

  /** DuckDB replay of the connector's md5-dyadic cells for ids in
    * [lo, hi]: same draw, category, value, score definitions as
    * [[graft.sources.v2.GenSource]].
    */
  private def genReplaySql(lo: Long, hi: Long): String =
    s"""ids AS (SELECT CAST(range AS BIGINT) AS id FROM range($Rows)
                WHERE range BETWEEN $lo AND $hi),
        cells AS (SELECT id,
          'cat_' || CAST(CAST(floor(((CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:c'),1,12)) AS BIGINT)+0.5)/281474976710656.0) * 8) AS INT) AS VARCHAR) AS category,
          CAST(floor(((CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:v'),1,12)) AS BIGINT)+0.5)/281474976710656.0) * 1000000.0) AS BIGINT) AS value,
          (CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:s'),1,12)) AS BIGINT)+0.5)/281474976710656.0 AS score
          FROM ids)"""

  // ---------------------------------------------------------------- q612

  /** Category aggregate under a pushed id range: the scan absorbs
    * `id ∈ [65536, 131071]` (plans 4 of 16 id splits, zero post-scan id
    * filter) and prunes to the three projected columns. min/max of the
    * dyadic scores and the BIGINT value sum are order-insensitive and
    * exact, so the hash compare is bit-strict.
    */
  val q612Dsv2Pushdown: QueryDef = QueryDef(
    "q612_dsv2_pushdown",
    (s, _) =>
      gen(s)
        .filter(col("id") >= 65536L && col("id") <= 131071L)
        .groupBy(col("category"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value")).as("total_value"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("category")),
    Some(s"""WITH ${genReplaySql(65536L, 131071L)}
        SELECT category, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS BIGINT) AS total_value,
               min(score) AS min_score, max(score) AS max_score
        FROM cells GROUP BY category ORDER BY category""")
  )

  // ---------------------------------------------------------------- q613

  /** Partial pushdown: the id bound is absorbed by the scan, the
    * category equality is REFUSED (returned residual) and re-applied by
    * Spark above the BatchScan — the compose-correctly proof for mixed
    * pushable/unpushable predicates.
    */
  val q613Dsv2Residual: QueryDef = QueryDef(
    "q613_dsv2_residual",
    (s, _) =>
      gen(s)
        .filter(col("id") < 32768L && col("category") === "cat_3")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value")).as("total_value"),
          max(col("id")).as("max_id")),
    Some(s"""WITH ${genReplaySql(0L, 32767L)}
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS BIGINT) AS total_value,
               CAST(max(id) AS BIGINT) AS max_id
        FROM cells WHERE category = 'cat_3'""")
  )

  // ---------------------------------------------------------------- q615

  /** The VECTORIZED read path: `columnar=true` makes the reader factory
    * report columnar support, so the scan fills 4096-row
    * OnHeapColumnVector batches and the plan carries a ColumnarToRow
    * transition instead of per-row `get()` calls — the connector-side
    * half of the vectorized-parquet discipline, over the same pushed id
    * range machinery. Deciles of the dyadic score are exact (score·10 is
    * one IEEE multiply both engines evaluate identically).
    */
  val q615Dsv2Columnar: QueryDef = QueryDef(
    "q615_dsv2_columnar",
    (s, _) =>
      gen(s, columnar = true)
        .filter(col("id") >= 131072L && col("id") <= 196607L)
        .select(floor(col("score") * 10).cast("int").as("decile"), col("value"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
        .orderBy(col("decile")),
    Some(s"""WITH ${genReplaySql(131072L, 196607L)}
        SELECT CAST(floor(score * 10) AS INT) AS decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS BIGINT) AS total_value
        FROM cells GROUP BY 1 ORDER BY 1""")
  )

  // ---------------------------------------------------------------- q620

  /** AGGREGATE pushdown: count(*)/min(id)/max(id) with no grouping are
    * absorbed by the scan (`SupportsPushDownAggregates`) and collapse to
    * one CLOSED-FORM row per planned partition — O(1) per partition, no
    * data rows generated; Spark's final aggregate combines the partials.
    * Composes with the pushed id bound (filters push first).
    */
  val q620Dsv2AggPushdown: QueryDef = QueryDef(
    "q620_dsv2_agg_pushdown",
    (s, _) =>
      gen(s)
        .filter(col("id") >= 4096L && col("id") <= 200000L)
        .agg(
          expr("count(*)").as("n"),
          min(col("id")).as("min_id"),
          max(col("id")).as("max_id")),
    Some(s"""SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(min(id) AS BIGINT) AS min_id,
                    CAST(max(id) AS BIGINT) AS max_id
             FROM (SELECT CAST(range AS BIGINT) AS id FROM range($Rows)
                   WHERE range BETWEEN 4096 AND 200000)""")
  )

  // ---------------------------------------------------------------- q622

  /** RUNTIME filtering (the connector analogue of dynamic partition
    * pruning, `SupportsRuntimeFiltering`): the generator joined on `id`
    * to a probe set derived from the customer dimension — once the
    * build side materializes, the scan receives the probe ids and drops
    * id splits holding none of them BEFORE generating their rows.
    * Correctness never depends on the pruning (the join re-filters), so
    * the oracle simply replays the join.
    */
  val q622Dsv2RuntimeFilter: QueryDef = QueryDef(
    "q622_dsv2_runtime_filter",
    (s, dir) => {
      val probes = graft.sources.Tables
        .table(s, dir, "customer")
        .select((col("c_custkey") * 53L).as("probe_id"))
      gen(s)
        .join(probes, col("id") === col("probe_id"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value")).as("total_value"),
          countDistinct(col("category")).as("n_cats"))
    },
    Some(s"""WITH ${genReplaySql(0L, Rows - 1)},
        probes AS (SELECT c_custkey * 53 AS probe_id FROM customer)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS BIGINT) AS total_value,
               CAST(count(DISTINCT category) AS BIGINT) AS n_cats
        FROM cells JOIN probes ON cells.id = probes.probe_id""")
  )

  val all: Seq[QueryDef] =
    Seq(
      q612Dsv2Pushdown,
      q613Dsv2Residual,
      q615Dsv2Columnar,
      q620Dsv2AggPushdown,
      q622Dsv2RuntimeFilter)
}
