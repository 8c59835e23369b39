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
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
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

class SyntheticEventsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-events($rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticEventsScanBuilder(rows, partitions)
}

class SyntheticEventsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var requiredSchema: StructType = SyntheticEvents.schema
  private var lo: Long = 0L          // inclusive id bound after pushdown
  private var hi: Long = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan = new SyntheticEventsScan(
    requiredSchema, math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), partitions)
}

case class IdRangePartition(start: Long, end: Long) extends InputPartition

class SyntheticEventsScan(requiredSchema: StructType, lo: Long, hi: Long,
                          partitions: Int) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
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
