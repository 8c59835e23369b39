package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 read connector — the in-engine stand-in for the
  * reference's Airbyte connector ingestion (SURVEY §2.1 S1, otherwise
  * out-of-engine): `spark.read.format("graft-events").option("rows", n)`
  * yields a deterministic synthetic events feed. The point is the
  * CONNECTOR surface, implemented the way a real S1 source (an HTTP
  * paging API, a Kafka snapshot, a SaaS export) plugs into Spark at
  * 100 TB:
  *
  *  - `planInputPartitions` splits the id domain into `partitions`
  *    ranges — the parallelism contract (each range = one task, no
  *    driver bottleneck, no shuffle to ingest);
  *  - `SupportsPushDownRequiredColumns` prunes generation to the
  *    projected columns (a real connector would drop payload fields at
  *    the wire);
  *  - `SupportsPushDownFilters` accepts range/equality predicates on
  *    `event_id` and narrows the generated domain itself — the scan
  *    NEVER materializes filtered-out rows (`.explain` shows them under
  *    PushedFilters); non-id predicates are left to Spark as residuals.
  *
  * Rows are a pure function of `event_id`, so the feed is reproducible
  * across runs/partitionings — the property every ingest test wants. */
class SyntheticEventsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(8),
      batchRows = Option(properties.get("batchRows")).map(_.toLong).getOrElse(10000L))
}

object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val baseTsUs: Long = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val types = Array("view", "click", "purchase", "signup")

  /** column value as a pure function of (event_id, column ordinal in the
    * FULL schema) — the generation contract pruning/pushdown must keep */
  def value(id: Long, field: String): Any = field match {
    case "event_id" => id
    case "ts" => baseTsUs + id * 1000000L
    case "user_id" => (id * 2654435761L) % 1000L
    case "event_type" => UTF8String.fromString(types(((id * 40503L) % 4L).toInt))
    case "value" => (id % 1000L) / 10.0
    case "props" => UTF8String.fromString(s"""{"k": ${id % 100}}""")
  }
}

class SyntheticEventsTable(rows: Long, partitions: Int, batchRows: Long = 10000L)
    extends Table with SupportsRead {
  override def name(): String = s"graft-events($rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticEventsScanBuilder(rows, partitions, batchRows)
}

class SyntheticEventsScanBuilder(rows: Long, partitions: Int, batchRows: Long = 10000L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}

  private var requiredSchema: StructType = SyntheticEvents.schema
  private var lo: Long = 0L          // inclusive id bound after pushdown
  private var hi: Long = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAggs: Seq[String] = Seq.empty // for the one-row agg scan
  private var topNPartial = false    // a pushed TopN keeps Spark's final sort

  /** LIMIT folds into the generated id range itself: ids are dense in
    * [lo, hi), so any n of them satisfy LIMIT semantics and the first n
    * ([lo, lo+n)) is the deterministic choice — the source never
    * materializes a row the limit would discard (a real S1 connector
    * puts the page-size cap on the wire request). Fully pushed: the
    * range already holds exactly min(n, hi-lo) rows. */
  override def pushLimit(n: Int): Boolean = {
    if (n >= 0 && lo + n < hi) hi = lo + n
    true
  }
  override def isPartiallyPushed(): Boolean = topNPartial

  /** ORDER BY event_id ASC [NULLS FIRST|LAST] LIMIT n — the generator
    * emits ids ascending, so the first n of the range IS the top-n.
    * Declared PARTIAL so Spark still runs its (now n-row) global sort:
    * partition readers are each sorted but the ranges land unmerged. */
  override def pushTopN(orders: Array[V2SortOrder], n: Int): Boolean = {
    val idAsc = orders.length == 1 && (orders(0).expression() match {
      case nr: NamedReference =>
        nr.fieldNames.sameElements(Array("event_id")) &&
          orders(0).direction() == SortDirection.ASCENDING
      case _ => false
    })
    if (!idAsc) return false
    pushLimit(n)
    topNPartial = true
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("event_id", _: Long) => true
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case IsNotNull("event_id") => true // non-nullable: trivially satisfied
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    residual // Spark re-applies only these
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** ungrouped count(*)/count(event_id)/min(event_id)/max(event_id)
    * fold to O(1) range arithmetic at the source — the warehouse-
    * federation shape (a real S1 connector ships the aggregate to the
    * remote system instead of pulling every row). Anything else —
    * grouping, other columns, distinct — declines and scans normally. */
  private def supported(agg: Aggregation): Option[Seq[String]] = {
    def idRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("event_id"))
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty) return None
    val resolved = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count(*)")
      case c: Count if !c.isDistinct && idRef(c.column) => Some("count(event_id)")
      case m: Min if idRef(m.column) => Some("min(event_id)")
      case m: Max if idRef(m.column) => Some("max(event_id)")
      case (_: AggregateFunc) => None
    }
    if (resolved.contains(None)) None else Some(resolved.flatten)
  }

  // exact, single-source: Spark must NOT re-aggregate the pushed row
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    supported(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    supported(aggregation) match {
      case Some(names) => pushedAggs = names; true
      case None => false
    }

  override def build(): Scan =
    if (pushedAggs.nonEmpty)
      new SyntheticEventsAggScan(pushedAggs, math.max(lo, 0L),
        math.max(hi, math.max(lo, 0L)))
    else new SyntheticEventsScan(
      requiredSchema, math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), partitions,
      batchRows)
}

/** One-row scan carrying the COMPLETE pushed aggregates, computed from
  * the (post-filter-pushdown) id range in O(1): the generator's ids are
  * dense in [lo, hi), so count = hi-lo, min = lo, max = hi-1; the empty
  * range yields count 0 with null min/max (global-aggregate semantics).
  * `.explain` shows these under PushedAggregates on the scan relation. */
class SyntheticEventsAggScan(aggs: Seq[String], lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.map(a => StructField(a, LongType, nullable = !a.startsWith("count"))))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events PushedAggregates=[${aggs.mkString(", ")}] range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsAggReaderFactory(aggs)
}

/** standalone (serializable) factory — must not capture the Scan */
class SyntheticEventsAggReaderFactory(aggs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[IdRangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val go = !emitted; emitted = true; go }
      override def get(): InternalRow = {
        val n = math.max(0L, r.end - r.start)
        InternalRow.fromSeq(aggs.map {
          case a if a.startsWith("count") => n
          case "min(event_id)" => if (n > 0) r.start else null
          case "max(event_id)" => if (n > 0) r.end - 1 else null
        })
      }
      override def close(): Unit = ()
    }
  }
}

case class IdRangePartition(start: Long, end: Long) extends InputPartition

class SyntheticEventsScan(requiredSchema: StructType, lo: Long, hi: Long,
                          partitions: Int, batchRows: Long = 10000L)
    extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SyntheticEventsMicroBatchStream(requiredSchema, lo, hi, partitions,
      math.max(1L, batchRows))
  override def description(): String =
    s"graft-events range=[$lo,$hi) cols=${requiredSchema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val p = math.min(partitions.toLong, n).toInt
      (0 until p).map { i =>
        IdRangePartition(lo + n * i / p, lo + n * (i + 1) / p)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(requiredSchema.fieldNames)
}

/** Watermark offset for the streaming read: "ids below `id` have been
  * made visible". JSON round-trips through the checkpoint log. */
case class SyntheticEventsOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** Micro-batch streaming face of the same generator — the connector's
  * incremental-sync mode (SURVEY §2.9 I1 via the S1 connector surface):
  * `spark.readStream.format("graft-events").option("batchRows", n)`.
  *
  * Admission control is STATELESS: `latestOffset(start, _)` advances the
  * visibility watermark `batchRows` past the engine-supplied start, so a
  * restart from any checkpointed offset resumes exactly (the driver
  * object holds no progress state to lose). Each micro-batch plans the
  * same `IdRangePartition` ranges as the batch scan — per-executor
  * generation, no driver materialization — and a (start, end] offset
  * pair replays identically forever, which is what makes the
  * checkpointed file-sink pipeline exactly-once end to end. */
class SyntheticEventsMicroBatchStream(requiredSchema: StructType, lo: Long,
                                      hi: Long, partitions: Int, batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit}

  // Trigger.AvailableNow target: the feed is bounded at `hi` by
  // construction, and latestOffset() never advances past it, so the
  // prepared target needs no extra capture.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): StreamOffset = SyntheticEventsOffset(lo)
  override def deserializeOffset(json: String): StreamOffset =
    SyntheticEventsOffset(json.trim.toLong)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(batchRows)
  override def reportLatestOffset(): StreamOffset = SyntheticEventsOffset(hi)
  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[SyntheticEventsOffset].id
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      case _ => batchRows
    }
    SyntheticEventsOffset(math.min(hi, s + math.max(1L, step)))
  }
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control path")

  override def planInputPartitions(start: StreamOffset, end: StreamOffset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SyntheticEventsOffset].id
    val e = end.asInstanceOf[SyntheticEventsOffset].id
    val n = e - s
    if (n <= 0) Array.empty
    else {
      val p = math.min(partitions.toLong, n).toInt
      (0 until p).map { i =>
        IdRangePartition(s + n * i / p, s + n * (i + 1) / p)
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(requiredSchema.fieldNames)
}

class SyntheticEventsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[IdRangePartition]
    new PartitionReader[InternalRow] {
      private var id = range.start - 1
      override def next(): Boolean = { id += 1; id < range.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map(f => SyntheticEvents.value(id, f)))
      override def close(): Unit = ()
    }
  }
}
