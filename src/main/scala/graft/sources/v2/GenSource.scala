package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch,
  InputPartition,
  PartitionReader,
  PartitionReaderFactory,
  Scan,
  ScanBuilder,
  SupportsPushDownAggregates,
  SupportsPushDownFilters,
  SupportsPushDownRequiredColumns
}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream,
  Offset,
  ReadLimit,
  SupportsTriggerAvailableNow
}
import org.apache.spark.sql.connector.read.{SupportsRuntimeFiltering => RuntimeFiltering}
import org.apache.spark.sql.sources.{
  DataSourceRegister,
  EqualTo,
  Filter,
  GreaterThan,
  GreaterThanOrEqual,
  In,
  IsNotNull,
  LessThan,
  LessThanOrEqual
}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-gen`: a DataSource V2 batch connector — the engine's connector
  * surface, exercising the planner paths none of the file sources do:
  *
  *   - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): the
  *     reader computes ONLY the columns the query projects — the md5
  *     draws for unread columns are never hashed;
  *   - '''filter pushdown''' ([[SupportsPushDownFilters]]): range/equality
  *     predicates on `id` are absorbed exactly (removed from the
  *     post-scan filter) and surfaced in `explain` as pushed filters;
  *   - '''partition pruning''': `planInputPartitions` intersects each
  *     contiguous id-range split with the pushed id bounds and drops
  *     empty splits — a `WHERE id < rows/4` plans only 1/4 of the
  *     partitions, the connector-level analogue of parquet partition
  *     pruning.
  *
  * Data is the engine's cross-replayable md5-dyadic seeded stream (same
  * construction as [[graft.sources.DataGen]], SURVEY §7.3b): every cell is
  * a pure function of (id, seed), so DuckDB replays the whole table
  * bit-for-bit from `range(rows)` — the q612 oracle does. At 100 TB this
  * is the shape of any custom connector worth writing: pruning and
  * pushdown negotiated with Catalyst so the cluster never materializes
  * what the query doesn't read.
  *
  * Usage: `spark.read.format("graft-gen").option("rows", n)
  * .option("partitions", p).option("seed", s).load()`.
  */
class GenTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      rows = properties.getOrDefault("rows", "1024").toLong,
      partitions = properties.getOrDefault("partitions", "8").toInt,
      seed = properties.getOrDefault("seed", "42").toLong,
      columnar = properties.getOrDefault("columnar", "false").toBoolean,
      rowsPerBatch = properties.getOrDefault("rowsPerBatch", "16384").toLong)
}

object GenSource {
  val schema: StructType = StructType(
    Seq(
      StructField("id", LongType, nullable = false),
      StructField("category", StringType, nullable = false),
      StructField("value", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))

  /** The md5-dyadic uniform in (0,1): first 12 hex digits of
    * md5("id:seed:tag") + 0.5, over 2^48 — byte-identical to Spark's
    * `conv(substring(md5(...),1,12),16,10)` and DuckDB's
    * `('0x'||substring(md5(...),1,12))::BIGINT` replays.
    */
  def dyadicU(id: Long, seed: Long, tag: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d
      .digest(s"$id:$seed:$tag".getBytes("UTF-8"))
      .take(6)
      .map(b => f"${b & 0xff}%02x")
      .mkString
    (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0 // 2^48
  }

  def category(id: Long, seed: Long): String =
    "cat_" + math.floor(dyadicU(id, seed, "c") * 8).toInt

  def value(id: Long, seed: Long): Long =
    math.floor(dyadicU(id, seed, "v") * 1000000.0).toLong

  def score(id: Long, seed: Long): Double = dyadicU(id, seed, "s")
}

class GenTable(
    rows: Long,
    partitions: Int,
    seed: Long,
    columnar: Boolean = false,
    rowsPerBatch: Long = 16384L)
    extends Table
    with SupportsRead {
  override def name(): String = s"graft-gen($rows rows, $partitions parts, seed $seed)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, partitions, seed, columnar, rowsPerBatch)
}

class GenScanBuilder(
    rows: Long,
    partitions: Int,
    seed: Long,
    columnar: Boolean = false,
    rowsPerBatch: Long = 16384L)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = GenSource.schema
  private var accepted: Array[Filter] = Array.empty
  private var minId: Long = 0L
  private var maxId: Long = rows - 1 // inclusive bounds after pushdown
  private var pushedAgg: Option[Seq[String]] = None // "count" | "min" | "max"

  /** Absorb exactly the id predicates the reader can honor losslessly;
    * everything else stays residual for Spark to re-apply post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case IsNotNull("id" | "category" | "value" | "score") => true // nothing is null
      case _ => false
    }
    ours.foreach {
      case EqualTo("id", v: Long) =>
        minId = math.max(minId, v); maxId = math.min(maxId, v)
      case GreaterThan("id", v: Long) => minId = math.max(minId, v + 1)
      case GreaterThanOrEqual("id", v: Long) => minId = math.max(minId, v)
      case LessThan("id", v: Long) => maxId = math.min(maxId, v - 1)
      case LessThanOrEqual("id", v: Long) => maxId = math.min(maxId, v)
      case _ => ()
    }
    accepted = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** AGGREGATE pushdown (partial): count(*) / min(id) / max(id) with no
    * grouping collapse to CLOSED FORM over each partition's id range —
    * the reader emits one pre-aggregated row per partition and never
    * generates data rows; Spark's final aggregate combines the partials.
    * Anything else (grouping, other columns) is refused and runs as a
    * normal scan + aggregate.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    val kinds = aggregation.aggregateExpressions.map {
      case _: CountStar => "count"
      case m: Min if m.column.describe == "id" => "min"
      case m: Max if m.column.describe == "id" => "max"
      case _ => null
    }
    if (kinds.contains(null)) false
    else {
      pushedAgg = Some(kinds.toSeq)
      true
    }
  }

  override def build(): Scan = {
    val schema = pushedAgg match {
      case Some(kinds) =>
        StructType(kinds.zipWithIndex.map { case (k, i) =>
          StructField(s"${k}_$i", LongType, nullable = false)
        })
      case None => required
    }
    new GenScan(
      rows, partitions, seed, schema, accepted, minId, maxId, columnar, rowsPerBatch, pushedAgg)
  }
}

class GenScan(
    rows: Long,
    partitions: Int,
    seed: Long,
    required: StructType,
    pushed: Array[Filter],
    val minId: Long,
    val maxId: Long,
    columnar: Boolean = false,
    rowsPerBatch: Long = 16384L,
    val aggPushed: Option[Seq[String]] = None)
    extends Scan
    with Batch
    with RuntimeFiltering {

  /** RUNTIME filtering (the connector analogue of dynamic partition
    * pruning): after a join's build side materializes, Spark hands the
    * scan an `In(id, …)` filter and re-plans input partitions — splits
    * holding none of the probe ids are dropped at RUNTIME, before a
    * single row of theirs is generated. Correctness never depends on it
    * (the join re-filters); it is purely the scan-elision hint, so
    * anything unrecognized is ignored.
    */
  @volatile private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("id", values) =>
        runtimeIds = Some(values.collect { case v: Long => v }.sorted)
      case _ => () // pruning is best-effort; unrecognized filters are no-ops
    }

  /** True iff some runtime id lands in [lo, hi); vacuously true before a
    * runtime filter arrives.
    */
  private def runtimeHit(lo: Long, hi: Long): Boolean = runtimeIds match {
    case None => true
    case Some(ids) =>
      var i = java.util.Arrays.binarySearch(ids, lo)
      if (i < 0) i = -i - 1
      i < ids.length && ids(i) < hi
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-gen pushed=[${pushed.mkString(", ")}] ids=[$minId, $maxId]" +
      aggPushed.map(k => s" agg=[${k.mkString(", ")}]").getOrElse("")

  override def toBatch: Batch = this

  /** Contiguous ⌈rows/partitions⌉-sized id splits, intersected with the
    * pushed id bounds; empty intersections are dropped — partition
    * pruning at plan time.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).iterator
      .map { p =>
        val lo = math.max(p * per, minId)
        val hi = math.min(math.min((p + 1) * per, rows), maxId + 1) // exclusive
        GenInputPartition(lo, hi)
      }
      .filter(ip => ip.lo < ip.hi && runtimeHit(ip.lo, ip.hi))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    aggPushed match {
      case Some(kinds) => GenAggReaderFactory(kinds)
      case None => GenReaderFactory(seed, required.fieldNames, columnar)
    }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(rows, partitions, seed, rowsPerBatch, required.fieldNames)
}

/** Offset = the exclusive upper id already ingested. */
case class GenOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** The connector's STREAMING face: the id space replayed as a bounded
  * micro-batch stream with real admission control — each batch admits at
  * most `rowsPerBatch` ids past the committed offset, and
  * Trigger.AvailableNow drains batch-by-batch to the prepared target
  * (not one giant batch), exactly the backpressure contract a Kafka-ish
  * source honors. Offsets are plain id watermarks, so recovery replays
  * deterministically: the md5-dyadic cells are pure functions of id.
  */
class GenMicroBatchStream(
    rows: Long,
    partitions: Int,
    seed: Long,
    rowsPerBatch: Long,
    columns: Array[String])
    extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = GenOffset(0L)
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // consulted only when admission control is bypassed
  override def latestOffset(): Offset = GenOffset(rows)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].id
    val cap = availableNowTarget.getOrElse(rows)
    GenOffset(math.min(cap, s + rowsPerBatch))
  }

  override def reportLatestOffset(): Offset = GenOffset(rows)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(rows)

  /** Each micro-batch's id range split into up to `partitions` slices. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GenOffset].id
    val hi = end.asInstanceOf[GenOffset].id
    if (lo >= hi) Array.empty
    else {
      val per = math.max(1L, (hi - lo + partitions - 1) / partitions)
      (lo until hi by per).map(a => GenInputPartition(a, math.min(a + per, hi))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory(seed, columns)
}

case class GenInputPartition(lo: Long, hi: Long) extends InputPartition

/** Pre-aggregated read: ONE closed-form row per partition — count, min
  * and max of the id range cost O(1) regardless of partition size, the
  * whole point of shipping the aggregate to the source.
  */
case class GenAggReaderFactory(kinds: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(kinds.map {
        case "count" => p.hi - p.lo
        case "min" => p.lo
        case "max" => p.hi - 1
        case other => throw new IllegalArgumentException(s"unknown agg $other")
      })
      override def close(): Unit = ()
    }
  }
}

case class GenReaderFactory(seed: Long, columns: Array[String], columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new GenPartitionReader(p.lo, p.hi, seed, columns)
  }

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new GenColumnarReader(p.lo, p.hi, seed, columns)
  }
}

/** Vectorized read path: fills [[OnHeapColumnVector]]s in 4096-row
  * batches, so the scan feeds Spark's columnar pipeline (a
  * `ColumnarToRow` transition in the plan instead of per-row `get()`
  * calls) — the connector-side half of the vectorized-parquet discipline.
  */
class GenColumnarReader(lo: Long, hi: Long, seed: Long, columns: Array[String])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val BatchRows = 4096
  private val schema = StructType(columns.map(c => GenSource.schema(c)))
  private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, schema)
  private val batch = new ColumnarBatch(vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
  private var nextId = lo

  override def next(): Boolean = {
    if (nextId >= hi) return false
    val n = math.min(BatchRows.toLong, hi - nextId).toInt
    vectors.foreach(_.reset())
    var j = 0
    while (j < columns.length) {
      val vec = vectors(j)
      columns(j) match {
        case "id" =>
          var i = 0; while (i < n) { vec.putLong(i, nextId + i); i += 1 }
        case "category" =>
          var i = 0
          while (i < n) {
            val b = GenSource.category(nextId + i, seed).getBytes("UTF-8")
            vec.putByteArray(i, b, 0, b.length); i += 1
          }
        case "value" =>
          var i = 0; while (i < n) { vec.putLong(i, GenSource.value(nextId + i, seed)); i += 1 }
        case "score" =>
          var i = 0; while (i < n) { vec.putDouble(i, GenSource.score(nextId + i, seed)); i += 1 }
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      j += 1
    }
    batch.setNumRows(n)
    nextId += n
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = batch.close()
}

class GenPartitionReader(lo: Long, hi: Long, seed: Long, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private var id = lo - 1
  override def next(): Boolean = { id += 1; id < hi }

  override def get(): InternalRow = {
    val cells: Array[Any] = columns.map {
      case "id" => id
      case "category" => UTF8String.fromString(GenSource.category(id, seed))
      case "value" => GenSource.value(id, seed)
      case "score" => GenSource.score(id, seed)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(cells.toIndexedSeq)
  }

  override def close(): Unit = ()
}
