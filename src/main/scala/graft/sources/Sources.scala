package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1). Connector ingestion (S1: Airbyte
  * → warehouse) is out-of-engine — the harness pre-lands parquet; these
  * wrappers cover the in-engine load/store operators with explicit schemas
  * (ingest-with-declared-schema mirrors the reference's validate-at-the-
  * door posture; inference is opt-in, never default).
  */
object Sources {

  /** S2 — CSV scan with declared schema (header mode matches the
    * reference's pandas read_csv defaults). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S2 variant — schema-inferred CSV (diagnostic use only). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S3 — CSV sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON scan/sink (Airbyte-landing shape). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC scan/sink — the other columnar interchange format a warehouse
    * migration lands (Hive-era lakes are ORC; this engine's native
    * tables stay parquet). Same predicate-pushdown / column-pruning /
    * split-generation behavior as the parquet path — Spark's ORC v2
    * source reads footers and prunes stripes identically. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** S10 — CTAS full overwrite (`CREATE OR REPLACE TABLE … AS SELECT`). */
  def overwriteTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S11 — INSERT-append (`insert_data` dbt macro). */
  def appendTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S12 — TRUNCATE: overwrite with the empty prefix of the same schema. */
  def truncateTable(spark: SparkSession, path: String): Unit = {
    val empty = spark.read.parquet(path).limit(0)
    empty.write.mode(SaveMode.Overwrite).parquet(s"$path.__truncating")
    overwriteTable(spark.read.parquet(s"$path.__truncating"), path)
  }

  /** S13 — backup/restore table ops (macros invoked but undefined in the
    * reference; reconstructed intent — copy table, copy back). */
  def backupTable(spark: SparkSession, path: String, backupPath: String): Unit =
    overwriteTable(spark.read.parquet(path), backupPath)
  def restoreTable(spark: SparkSession, backupPath: String, path: String): Unit =
    overwriteTable(spark.read.parquet(backupPath), path)

  /** S8 — relational scan over JDBC (the reference's per-dimension
    * PostgreSQL reads, sync_data.py:126-134). `predicates` pushes the
    * company_id filter to the database. Untestable in this environment
    * (no database server) — the wrapper documents the mapping. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties, predicates: Array[String] = Array.empty): DataFrame =
    if (predicates.isEmpty) spark.read.jdbc(url, table, props)
    else spark.read.jdbc(url, table, predicates, props)

  /** S8 at scale — range-partitioned parallel JDBC scan: `numPartitions`
    * concurrent range queries over `partitionCol` instead of ONE serial
    * cursor dragging the whole table through a single connection. This is
    * the difference between a 10-minute and a multi-hour dimension sync
    * once the source table stops fitting a single cursor's throughput;
    * bounds come from the caller (a prior min/max query, or the known id
    * domain) so the stride split is planning-time only. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          props: java.util.Properties, partitionCol: String,
                          lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** S9 — set-based JDBC sink, replacing the reference's row-at-a-time
    * INSERT loop (sync_data.py:250-252). Untestable here; see S8 note. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Partitioned parquet sink — the at-scale default for fact tables
    * (date-partitioned output enables partition pruning on the watermark
    * and date-range scans; SURVEY.md §4 incremental-scan note). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Dynamic partition overwrite — the incremental-backfill sink: only
    * the partitions PRESENT in `df` are replaced, untouched partitions
    * survive. This is how a daily re-run lands one day of a 100 TB
    * date-partitioned fact without rewriting (or locking) the other
    * 3,000 days. Static overwrite (the `writePartitioned` default) would
    * drop every existing partition first. */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  /** Small-file compaction: rewrite a table at ~`targetRowsPerFile` rows
    * per file. Streaming sinks and repeated dynamic-partition appends
    * accrete thousands of KB-scale files; at cluster scale the scan cost
    * becomes file-open-bound (driver listing + one task per file), so
    * periodic compaction is part of operating the table, not an
    * optimization. Staged through a sibling path (same pattern as
    * truncateTable) because a lazy scan cannot overwrite its own input.
    * Row-count-based sizing is deliberate: row width varies per table, so
    * callers pick targetRowsPerFile from their row size to hit the
    * 128 MB-1 GB file sweet spot. */
  def compactTable(spark: SparkSession, path: String,
                   targetRowsPerFile: Long): Unit = {
    val staged = s"$path.__compacting"
    val src = spark.read.parquet(path)
    val n = math.max(1L, math.ceil(
      src.count().toDouble / targetRowsPerFile).toLong).toInt
    src.repartition(n).write.mode(SaveMode.Overwrite).parquet(staged)
    overwriteTable(spark.read.parquet(staged), path)
    // drop the staged copy — leaving it would double the table's
    // footprint on every maintenance run
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staged), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    ()
  }

  /** Bucketed managed table — pre-shuffled layout so repeated joins/aggs
    * on the bucket key skip their exchange entirely (the co-located-join
    * path for fact×fact joins too big to broadcast). Requires the session
    * catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Schema-evolved read: one logical table whose parquet batches were
    * written under drifting schemas (columns added/dropped over time — the
    * normal life of a landed source; the reference's BigQuery loads get
    * this from `autodetect`+`WRITE_APPEND`). `mergeSchema` unions the
    * footer schemas at planning time; rows from batches that predate a
    * column read it as NULL. Merging is a planning-time cost over file
    * FOOTERS only (no data scan), so it holds at 100 TB where the
    * alternative — a migration rewriting every old file — does not. */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Validate-at-the-door CSV read with a quarantine lane: PERMISSIVE
    * parse capturing each malformed line verbatim in `_corrupt_record`
    * instead of silently nulling fields (default) or killing the job
    * (FAILFAST) — at 100 TB a landed feed ALWAYS has a few bad lines,
    * and dropping them silently is how row counts drift. Returns
    * (good, bad): parsed rows, and the raw offending lines for the
    * dead-letter audit. The one `.cache()` is required — Spark refuses
    * to answer a query that reads ONLY the corrupt-record column off an
    * unmaterialized CSV relation (the parser would never run); the
    * cache is registered with [[graft.QueryCaches]] so the harness
    * release hook covers it like every other per-query cache. */
  def readCsvAudited(spark: SparkSession, path: String,
                     schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .csv(path)
    val cached = graft.QueryCaches.scoped(raw)
    val good = cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = cached.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** Raw-media ingestion via Spark's `binaryFile` source — the first hop
    * of the multimodal pipeline: a directory of image/audio/video blobs
    * becomes one row per FILE, `(media_id, path, byte_len, content)`,
    * ready for `Multimodal.decodeMetadata`/`features`. `pathGlobFilter`
    * prunes at file-LISTING time, so non-matching files cost zero bytes
    * read. `media_id` is the 58-bit md5 fold of the path — stable across
    * re-listings and partitionings (a zipWithIndex id would not be). At
    * scale the source never splits a file but DOES bin many small files
    * per task under `spark.sql.files.maxPartitionBytes`, so a landing of
    * millions of small media files coalesces instead of one-task-per-file;
    * oversized blobs are guarded by `spark.sql.sources.binaryFile.maxLength`. */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        graft.functions.Fns.md5lo58(col("path")).as("media_id"),
        col("path"),
        col("length").as("byte_len"),
        col("content"))
  }
}
