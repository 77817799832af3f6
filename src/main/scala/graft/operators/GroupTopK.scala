package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group as a bounded-state partial aggregate.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY g ORDER BY
  * v DESC)` then `WHERE rn <= k` — sorts EVERY group's full row set before
  * discarding all but k rows. At 100 TB that is a full shuffle of the fact
  * table followed by per-partition sorts dominated by data that is thrown
  * away. This operator instead aggregates with a k-bounded buffer:
  * map-side partial aggregation keeps at most k (score, id) pairs per
  * group per task, so the shuffle carries `groups × k` structs instead of
  * every row, and no sort larger than 2k ever happens. Same reason the
  * reference keeps its percentile inputs as a compact list rather than
  * re-sorting the full request log (reference: src/statistics.py:46-72) —
  * never materialize more ordered state than the answer needs.
  *
  * Ordering: score DESC, id ASC (deterministic tie-break — required for
  * oracle hash parity).
  */
object GroupTopK {

  /** One candidate row: its sort score and a unique tie-break id. */
  final case class ScoredId(v: Double, id: Long)

  /** Encodable bounded buffer; `items` is kept ordered (v desc, id asc)
    * and never exceeds k elements.
    */
  final case class TopKBuf(items: Seq[ScoredId])

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  /** Merge two ordered bounded lists, keep the best k. Both inputs are
    * already ordered, so this is a linear merge — the reduce path inserts
    * single elements (cost O(k)), the merge path combines two partials.
    */
  private def mergeBounded(k: Int, a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredId]
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  /** The k-bounded typed Aggregator. Usable directly on a typed
    * `KeyValueGroupedDataset` or through [[topKPerGroup]] on DataFrames.
    */
  final class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
    require(k > 0, "k must be positive")
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, in: ScoredId): TopKBuf =
      TopKBuf(mergeBounded(k, b.items, Seq(in)))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(mergeBounded(k, a.items, b.items))
    override def finish(b: TopKBuf): TopKBuf = b
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Top-k rows per group over a DataFrame: one hash-aggregate (partial +
    * final), output exploded to `(groupCols..., rank, id, v)` with rank
    * 1-based in (v DESC, id ASC) order.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: Column,
      idCol: Column,
      k: Int
  ): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(scoreCol.cast("double"), idCol.cast("long")).as("__topk"))
      .select(
        groupCols.map(col) :+ posexplode(col("__topk.items")).as(Seq("__pos", "__e")): _*
      )
      .select(
        groupCols.map(col) ++ Seq(
          (col("__pos") + 1).cast("int").as("rank"),
          col("__e.id").as("id"),
          col("__e.v").as("v")
        ): _*
      )
  }
}
