package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.models.{Meta, Retail, TestdataAdapter}
import graft.sync.DimSync

/** The three reference lifecycles (SURVEY.md §3) as ordinary function
  * composition — the Airflow DAG surface (§2.11) collapses to Scala control
  * flow: TaskGroups = methods (C1), dynamic fan-out = map over dimensions
  * (C2), branch-on-empty = if (C3), XCom = arguments (C4), blue-green
  * promote with rollback = DimSync.promote (C5), dbt-subprocess models =
  * in-process DataFrame functions (C8).
  */
object Pipelines {

  final case class StageResult(stage: String, ok: Boolean, detail: String)

  /** C6's in-engine half: bounded retry with fixed delay for a pipeline
    * stage — the reference's `default_args(retries=2, retry_delay=10min)`
    * as a function combinator (the DAG-level alerting e-mail stays
    * out-of-engine with the scheduler). `attempts` counts TOTAL tries;
    * only the final failure escapes, earlier ones are recorded on it as
    * suppressed exceptions so a post-mortem sees every try. */
  def withRetries[T](attempts: Int, delayMillis: Long = 0L)(stage: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1: $attempts")
    val failures = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    var i = 0
    while (i < attempts) {
      try return stage
      catch {
        case scala.util.control.NonFatal(e) =>
          failures += e
          i += 1
          if (i < attempts && delayMillis > 0) Thread.sleep(delayMillis)
      }
    }
    val last = failures.last
    // `ne` guard: a stage that rethrows the SAME Throwable instance every
    // try would otherwise hit the JVM's self-suppression rejection
    failures.init.filter(_ ne last).foreach(last.addSuppressed)
    throw last
  }

  private def gate(stage: String, df: DataFrame, checks: Seq[Check]): StageResult = {
    val failed = Checks.evaluate(df, checks).filterNot(_.passed)
    StageResult(stage, failed.isEmpty,
      if (failed.isEmpty) "ok" else failed.map(f => s"${f.check_name}=${f.violations}").mkString(","))
  }

  /** §3.3 retail: load → check sources → dims/fact → check transform →
    * reports → check reports. */
  def retailLifecycle(spark: SparkSession, dir: String): Seq[StageResult] = {
    val raw = TestdataAdapter.rawInvoices(spark, dir)
    val country = TestdataAdapter.country(spark, dir)
    val srcGate = gate("check_load", raw, Seq(
      SchemaSuperset(Seq("InvoiceNo", "StockCode", "Quantity", "InvoiceDate", "UnitPrice")),
      RowCountMin(100)))
    val fct = Retail.fctInvoices(raw, country)
    val dimC = Retail.dimCustomer(raw, country)
    val tGate = gate("check_transform", fct, Seq(
      NonNull(Seq("invoice_id", "datetime_id", "product_id", "customer_id")),
      RangeMin("total", 0)))
    val report = Retail.reportCustomerInvoices(fct, dimC)
    val rGate = gate("check_report", report, Seq(
      RangeMin("total_invoices", 1), NonNull(Seq("country"))))
    Seq(srcGate, tGate, rGate)
  }

  /** §3.1 flagship meta: extract → validate schema → transform → validate →
    * incremental staging → blue-green promote (backup/restore) → validate.
    * `workDir` holds the staging/production/backup parquet twins. */
  def metaLifecycle(spark: SparkSession, dir: String, workDir: String): Seq[StageResult] = {
    val ads = TestdataAdapter.adsInsights(spark, dir)
    val extracted = gate("extracted_data_validation", ads, Seq(
      SchemaSuperset(Seq("ad_id", "campaign_id", "objective", "clicks",
        "impressions", "spend", "date_start", "updated_time"))))

    val transformed = Meta.fbAdsTransformed(ads, TestdataAdapter.campaigns(spark, dir))
    val tGate = gate("transformed_data_validation", transformed, Seq(
      RowCountMin(100),
      NonNull(Seq("id", "date", "clicks", "impressions")),
      UniqueKey(Seq("id"))))

    // incremental staging merge against the current production table
    val prodPath = s"$workDir/production"
    val stagingPath = s"$workDir/staging"
    val backupPath = s"$workDir/backup"
    // Hadoop FileSystem probe, not java.io.File — the production table
    // may live on HDFS/S3 where a local-file check always reads absent
    // (same idiom as EventsStream.runUpsertJob)
    val hPath = new org.apache.hadoop.fs.Path(prodPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prodExists = fs.exists(hPath)
    val existing =
      if (prodExists) spark.read.parquet(prodPath)
      else transformed.limit(0)
    val merged = Meta.incrementalMerge(
      existing.select("ad_id", "campaign_id", "date", "spend", "updated_at"),
      transformed.select("ad_id", "campaign_id", "date", "spend", "updated_at"),
      Seq("ad_id", "date"), tieBreak = Seq("ad_id"))
    merged.write.mode(SaveMode.Overwrite).parquet(stagingPath)
    if (!prodExists)
      merged.limit(0).write.mode(SaveMode.Overwrite).parquet(prodPath)

    // switch_to_production: backup → overwrite → validate → rollback on fail
    val promoted = DimSync.promote(spark, stagingPath, prodPath, backupPath,
      prod => Checks.evaluate(prod, Seq(RowCountMin(1), UniqueKey(Seq("ad_id", "date"))))
        .forall(_.passed))
    Seq(extracted, tGate,
      StageResult("switch_to_production", promoted, if (promoted) "promoted" else "rolled_back"))
  }

  /** transform_csv.py:1-12 — the standalone CSV transform: read, distinct
    * values of one column, write back out. */
  def transformCsv(spark: SparkSession, inPath: String, outPath: String,
                   column: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val df = graft.sources.Sources.readCsv(spark, inPath, schema)
    graft.sources.Sources.writeCsv(
      df.select(col(column)).na.drop().distinct(), outPath)
  }

  /** §3.2 dimension sync: per-dimension fan-out (C2) with branch-on-empty
    * (C3); returns per-dimension insert/delete counts. */
  def syncLifecycle(spark: SparkSession, dir: String): Seq[StageResult] = {
    val main = TestdataAdapter.mainWide(spark, dir)
    val dims = Seq("channel", "campaign", "publisher")
    dims.map { d =>
      val source = main
      val dim = main.select(col(d).as("name")).filter(col("name").isNotNull)
        .distinct().orderBy("name").limit(2) // simulated state; ordered ⇒ deterministic counts
      val values = DimSync.distinctValues(source, d)
      if (values.isEmpty) // C3: branch-on-empty → skip
        StageResult(s"sync_$d", ok = true, "skip")
      else {
        val ins = DimSync.insertMissing(source, d, dim).count()
        val del = DimSync.deleteStale(dim, source, d).count()
        StageResult(s"sync_$d", ok = true, s"insert=$ins,delete=$del")
      }
    }
  }
}
