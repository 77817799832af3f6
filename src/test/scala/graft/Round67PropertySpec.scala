package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GenInputPartition, GenMicroBatchStream, GenOffset, GenSource}
import graft.streaming.GenStream

/** Round-67 sweeps for the streaming connector face: the drained
  * end-state against a driver md5-dyadic fold, the REAL batch count under
  * admission control (4 = 65536/16384 — proving AvailableNow honored the
  * per-batch cap instead of slurping one giant batch), and unit-level
  * offset-arithmetic checks on [[GenMicroBatchStream]] (admission cap,
  * AvailableNow target, per-batch partition planning, offset round-trip).
  */
class Round67PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val Seed = 42L

  test("q616 multi-batch drain equals the driver fold; exactly 4 batches") {
    val (df, batches) = GenStream.drainCategoryAgg(spark, 65536L, 16384L, Seed)
    assert(batches == 4, s"admission control should force 4 micro-batches, saw $batches")
    val expected = (0L until 65536L)
      .map(id => (GenSource.category(id, Seed), GenSource.value(id, Seed), GenSource.score(id, Seed)))
      .groupBy(_._1)
      .map { case (c, xs) =>
        c -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).min, xs.map(_._3).max))
      }
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == expected)
  }

  test("offset arithmetic: admission cap, AvailableNow target, planning") {
    val s = new GenMicroBatchStream(100L, 4, Seed, 30L, Array("id"))
    assert(s.initialOffset() == GenOffset(0L))
    assert(s.deserializeOffset("42") == GenOffset(42L))
    // admission control caps each batch at rowsPerBatch past the start
    assert(s.latestOffset(GenOffset(0L), s.getDefaultReadLimit) == GenOffset(30L))
    assert(s.latestOffset(GenOffset(90L), s.getDefaultReadLimit) == GenOffset(100L))
    // AvailableNow pins the target; batches never pass it
    s.prepareForTriggerAvailableNow()
    assert(s.latestOffset(GenOffset(90L), s.getDefaultReadLimit) == GenOffset(100L))
    // batch range splits into at most `partitions` contiguous slices
    val parts = s.planInputPartitions(GenOffset(0L), GenOffset(30L))
      .map(_.asInstanceOf[GenInputPartition])
    assert(parts.map(p => p.hi - p.lo).sum == 30L)
    assert(parts.length <= 4 && parts.forall(p => p.lo < p.hi))
    assert(s.planInputPartitions(GenOffset(30L), GenOffset(30L)).isEmpty)
  }
}
