package graft.queries

import graft.streaming.GenStream

/** Round-67 addition (q616): the connector's STREAMING face — a custom
  * DSv2 [[graft.sources.v2.GenMicroBatchStream]] (MICRO_BATCH_READ
  * capability, `toMicroBatchStream`) with real offset management and
  * admission control: offsets are id watermarks, each batch admits
  * `rowsPerBatch` ids, and Trigger.AvailableNow drains to the prepared
  * target batch-by-batch (SupportsTriggerAvailableNow) — the
  * backpressure contract of a production source, over deterministic
  * md5-dyadic data so the DuckDB `range(n)` replay oracles the END STATE
  * of the whole multi-batch drain. Round67PropertySpec additionally
  * pins the batch count (4 = 65536/16384) and offset determinism.
  */
object Round67 {

  private val Rows = 65536L
  private val Batch = 16384L
  private val Seed = 42L

  val q616Dsv2Stream: QueryDef = QueryDef(
    "q616_dsv2_stream",
    (s, _) => GenStream.drainCategoryAgg(s, Rows, Batch, Seed)._1,
    Some(s"""WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range($Rows)),
        cells AS (SELECT id,
          'cat_' || CAST(CAST(floor(((CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:c'),1,12)) AS BIGINT)+0.5)/281474976710656.0) * 8) AS INT) AS VARCHAR) AS category,
          CAST(floor(((CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:v'),1,12)) AS BIGINT)+0.5)/281474976710656.0) * 1000000.0) AS BIGINT) AS value,
          (CAST(('0x'||substring(md5(CAST(id AS VARCHAR)||':$Seed:s'),1,12)) AS BIGINT)+0.5)/281474976710656.0 AS score
          FROM ids)
        SELECT category, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS BIGINT) AS total_value,
               min(score) AS min_score, max(score) AS max_score
        FROM cells GROUP BY category ORDER BY category""")
  )

  val all: Seq[QueryDef] = Seq(q616Dsv2Stream)
}
