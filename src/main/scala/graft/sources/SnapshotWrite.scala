package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Batch DSv2 WRITE for the snapshot format — the missing half of
  * [[GraftSnapshotBatchTable]] (which was BATCH_READ-only), so
  * `df.write.format("graft-snapshot").mode("append"|"overwrite").save(root)`
  * and the catalog's `INSERT INTO` / CTAS land as atomic table versions.
  *
  * Protocol (the staged-commit shape, specialized to the manifest-gated
  * format where no rename step is needed at all):
  *  - every task writes ONE parquet file directly under the commit's
  *    fresh `data/<uuid>/` dir — reads plan from the manifest's explicit
  *    file list, so unreferenced files are invisible by construction:
  *    writing "in place" IS staging;
  *  - each task folds its per-file column stats (min/max cast to long +
  *    null count for every stats column) INLINE while writing — unlike
  *    the Scala-API [[SnapshotTable.commitAppend]] (which re-scans the
  *    written files for stats), the distributed write pays zero extra
  *    I/O for the skipping index;
  *  - the driver's `commit` assembles the aligned stats and publishes
  *    via [[SnapshotTable.commitWrittenAppend]] /
  *    [[SnapshotTable.commitWrittenOverwrite]] — manifest-only, with the
  *    same optimistic create-exclusive retry as every other commit;
  *  - `abort` deletes the commit dir; the manifest (and so every reader)
  *    never saw the job.
  *
  * Schema: appends are gated by the table's evolution rules BEFORE any
  * task runs (fail-fast, nothing written) and re-validated per publish
  * attempt against the then-tip. Stats columns come from the table tip
  * (or catalog property), so a DSv2 append carries the skipping index
  * forward exactly like the streaming sink does. Stats are folded
  * natively for byte/short/int/long/boolean/timestamp columns; other
  * types record the never-pruned unknown sentinel (sound: unpruned =
  * read; the Scala commit path can still derive them by re-scan). */
object SnapshotWrite {
  // the manifest stats sentinels ([[SnapshotTable]] reads these as
  // "unknown — never prune"); -1 nulls = may contain NULLs
  private[sources] val UnknownMin = Long.MinValue
  private[sources] val UnknownMax = Long.MaxValue
  private[sources] val UnknownNulls = -1L
}

/** One committed data file + its inline-folded stats, aligned with the
  * factory's statsCols. */
case class SnapshotWriteMessage(file: String, rows: Long,
                                mins: Array[Long], maxs: Array[Long],
                                nulls: Array[Long]) extends WriterCommitMessage

class GraftSnapshotWriteBuilder(spark: SparkSession, root: String,
                                batchSchema: StructType,
                                statsCols: Seq[String])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      // fail-fast evolution gate: an incompatible append costs nothing
      // and writes nothing (re-validated per publish attempt too)
      if (!doTruncate)
        new SnapshotTable(spark, root, statsCols).validateAppendSchema(batchSchema)
      new GraftSnapshotBatchWrite(spark, root, batchSchema, statsCols, doTruncate)
    }
  }
}

class GraftSnapshotBatchWrite(spark: SparkSession, root: String,
                              schema: StructType, statsCols: Seq[String],
                              truncate: Boolean) extends BatchWrite {
  private val commitUuid = java.util.UUID.randomUUID().toString
  private def dataDir = new Path(root, "data")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // parquet writer settings captured from the SESSION on the driver so
    // executor-written files match what df.write.parquet would produce
    val conf = spark.sessionState.conf
    SnapshotWriterFactory(dataDir.toString, commitUuid, schema.json, statsCols,
      conf.writeLegacyParquetFormat.toString, conf.parquetOutputTimestampType.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.toSeq.map(_.asInstanceOf[SnapshotWriteMessage])
    // every task opens its file eagerly, so empty input partitions leave
    // 0-row files: drop them from the commit (and disk) — a wide empty
    // plan must not litter the manifest with schema-only shards
    val nonEmpty = all.filter(_.rows > 0L)
    if (nonEmpty.length != all.length) {
      val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      all.filter(_.rows == 0L).foreach(m =>
        fs.delete(new Path(new Path(dataDir, commitUuid), m.file), false))
    }
    val tasks = nonEmpty
    // zero-task/zero-row plans still need one schema-bearing file — a
    // file-less manifest would make read() of this version unplannable.
    // The driver writes it locally with the same writer (no Spark job).
    val ensured =
      if (tasks.nonEmpty) tasks
      else {
        val w = new SnapshotParquetWriter(dataDir.toString, commitUuid,
          "part-00000-empty.parquet", schema, statsCols,
          spark.sessionState.conf.writeLegacyParquetFormat.toString,
          spark.sessionState.conf.parquetOutputTimestampType.toString,
          spark.sparkContext.hadoopConfiguration)
        Seq(w.commit().asInstanceOf[SnapshotWriteMessage])
      }
    val files = ensured.map(m => s"$commitUuid/${m.file}")
    val stats: Seq[ColStats] = statsCols.indices.map { c =>
      ColStats(ensured.map(_.mins(c)), ensured.map(_.maxs(c)), ensured.map(_.nulls(c)))
    }
    val rows = ensured.map(_.rows).sum
    val table = new SnapshotTable(spark, root, statsCols)
    if (truncate) table.commitWrittenOverwrite(files, stats, rows, schema)
    else table.commitWrittenAppend(files, stats, rows, schema)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // nothing was published: dropping the commit dir erases the job
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dataDir, commitUuid), true)
    ()
  }
}

/** Serializable executor-side factory: one parquet file per task under
  * `data/<commitUuid>/`. Carries only strings/schemas — the executor
  * re-opens the filesystem from a fresh Hadoop config. */
case class SnapshotWriterFactory(dataDir: String, commitUuid: String,
                                 schemaJson: String, statsCols: Seq[String],
                                 legacyFormat: String, timestampType: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SnapshotParquetWriter(dataDir, commitUuid,
      f"part-$partitionId%05d-$taskId.parquet",
      DataType.fromJson(schemaJson).asInstanceOf[StructType], statsCols,
      legacyFormat, timestampType, new Configuration())
}

/** Task-side parquet writer over Spark's own [[ParquetWriteSupport]]
  * (InternalRow → parquet, the exact encoder the native scan writes
  * with), folding the per-file skipping-index stats as rows stream
  * through. Long-casts mirror [[SnapshotTable.writeDataFiles]]'s
  * `cast(col as long)`: integral types widen, boolean is 0/1, timestamp
  * is floor(epoch seconds); anything else records unknown (never
  * pruned — conservative, not wrong). */
class SnapshotParquetWriter(dataDir: String, commitUuid: String, fileName: String,
                            schema: StructType, statsCols: Seq[String],
                            legacyFormat: String, timestampType: String,
                            hadoopConf: Configuration)
    extends DataWriter[InternalRow] {
  import SnapshotWrite._

  private val path = new Path(new Path(dataDir, commitUuid), fileName)
  private val fs = path.getFileSystem(hadoopConf)

  private val writer: ParquetWriter[InternalRow] = {
    val conf = new Configuration(hadoopConf)
    ParquetWriteSupport.setSchema(schema, conf)
    // ParquetWriteSupport.init and its schema converter require these
    // explicitly present (the native writer's prepareWrite sets them the
    // same way); the last two take their session-default values
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, legacyFormat)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, timestampType)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    class B(out: HadoopOutputFile) extends ParquetWriter.Builder[InternalRow, B](out) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration)
          : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
        new ParquetWriteSupport
    }
    new B(HadoopOutputFile.fromPath(path, conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  // per-stats-column fold state; fieldIdx -1 / unsupported type => unknown
  private val fieldIdx: Array[Int] =
    statsCols.map(c => schema.fieldNames.indexOf(c)).toArray
  private val asLong: Array[InternalRow => Long] = statsCols.indices.map { c =>
    val i = fieldIdx(c)
    if (i < 0) null
    else schema.fields(i).dataType match {
      case ByteType => (r: InternalRow) => r.getByte(i).toLong
      case ShortType => (r: InternalRow) => r.getShort(i).toLong
      case IntegerType => (r: InternalRow) => r.getInt(i).toLong
      case LongType => (r: InternalRow) => r.getLong(i)
      case BooleanType => (r: InternalRow) => if (r.getBoolean(i)) 1L else 0L
      case TimestampType => // micros -> whole epoch seconds, Spark's ts->long cast
        (r: InternalRow) => Math.floorDiv(r.getLong(i), 1000000L)
      case _ => null
    }
  }.toArray
  private val mins = Array.fill(statsCols.length)(UnknownMax) // running min starts high
  private val maxs = Array.fill(statsCols.length)(UnknownMin)
  private val nullCounts = Array.fill(statsCols.length)(0L)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    writer.write(record)
    rows += 1
    var c = 0
    while (c < fieldIdx.length) {
      val i = fieldIdx(c)
      if (i >= 0 && asLong(c) != null) {
        if (record.isNullAt(i)) nullCounts(c) += 1
        else {
          val v = asLong(c)(record)
          if (v < mins(c)) mins(c) = v
          if (v > maxs(c)) maxs(c) = v
        }
      }
      c += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val outMins = new Array[Long](statsCols.length)
    val outMaxs = new Array[Long](statsCols.length)
    val outNulls = new Array[Long](statsCols.length)
    var c = 0
    while (c < statsCols.length) {
      val known = fieldIdx(c) >= 0 && asLong(c) != null
      // an all-null file has no band: unknown min/max but an EXACT null
      // count (what the rewrite-routing in replaceWhere keys on)
      outMins(c) = if (known && maxs(c) != UnknownMin) mins(c) else UnknownMin
      outMaxs(c) = if (known && maxs(c) != UnknownMin) maxs(c) else UnknownMax
      outNulls(c) = if (known) nullCounts(c) else UnknownNulls
      c += 1
    }
    SnapshotWriteMessage(fileName, rows, outMins, outMaxs, outNulls)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    fs.delete(path, false)
    ()
  }

  override def close(): Unit = ()
}
