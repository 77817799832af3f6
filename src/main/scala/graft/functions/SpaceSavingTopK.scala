package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SpaceSaving heavy-hitters as a [[TypedImperativeAggregate]] —
  * the internal Catalyst aggregate surface `percentile_approx`/HLL++ are
  * built on (object buffer + manual `serialize`/`deserialize` for
  * shuffle), one rung below the typed `Aggregator` the engine's UDAF row
  * ([[WelfordVariance]], [[GroupTopK]]) already proves. One pass, O(capacity)
  * state per group, map-side partials: the way to ask "which keys are
  * hot" on 100 TB WITHOUT a full groupBy-count shuffle of every distinct
  * key — the shuffle carries `capacity` slots per partition, not NDV rows.
  *
  * Guarantees (classic Metwally et al. bounds, preserved by the
  * keep-top-capacity merge):
  *   - reported `est` ≥ true count ≥ `est - err`, for every reported key;
  *   - every key with true count > N/capacity is reported;
  *   - with capacity ≥ NDV nothing ever evicts and `est` is EXACT with
  *     `err = 0` under ANY partitioning — the configuration the q618
  *     oracle pins bit-for-bit.
  *
  * Determinism: eviction takes the (count, key) ascending minimum, merge
  * truncation keeps the (count desc, key asc) top, and `eval` emits in
  * (count desc, key asc) order — no hash-iteration order leaks out.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
    with UnaryLike[Expression] {

  type Buf = mutable.HashMap[String, (Long, Long)] // key -> (count, err)

  override def prettyName: String = "space_saving_topk"
  override def nullable: Boolean = false
  override def dataType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"space_saving_topk: key must be STRING, got ${child.dataType.sql}")
    else if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure("space_saving_topk: capacity must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some((c, e)) => buf.update(key, (c + 1, e))
      case None if buf.size < capacity => buf.update(key, (1L, 0L))
      case None =>
        // evict the (count, key)-ascending minimum; the newcomer inherits
        // its count as the overestimation error
        val (mk, (mc, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(mk)
        buf.update(key, (mc + 1, mc))
    }
    buf
  }

  /** Pointwise sum, then keep the (count desc, key asc) top `capacity`.
    * Per-slot `est ≥ true ≥ est − err` survives the sum, and since
    * Σest ≤ N fewer than `capacity` keys can exceed N/capacity, so every
    * true heavy hitter survives the truncation.
    */
  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, (c, e)) =>
      a.get(k) match {
        case Some((c0, e0)) => a.update(k, (c0 + c, e0 + e))
        case None => a.update(k, (c, e))
      }
    }
    if (a.size <= capacity) a
    else {
      val kept = a.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: Buf): Any = new GenericArrayData(
    buf.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        InternalRow(UTF8String.fromString(k), c, e)
      }
      .toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
