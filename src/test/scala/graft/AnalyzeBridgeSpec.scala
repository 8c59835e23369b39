package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions

/** The ANALYZE TABLE bridge: Spark refuses the command for DSv2 tables,
  * so the graft extensions intercept it at the PARSER and serve it from
  * the manifest — zero data-file opens (proven by deleting the data
  * files first), results persisted as `stats.*` table properties, and
  * the CBO consuming the same manifest numbers through the connector's
  * statistics reporting. */
class AnalyzeBridgeSpec extends SparkSpec {
  import spark.implicits._

  /** A sibling session (same SparkContext, fresh SessionState) built
    * WITH the graft extensions — parsers cannot inject into a running
    * session, and the shared fixture session predates this spec. */
  private lazy val xspark =
    org.apache.spark.sql.graft.ExtensionTestSessions
      .withGraftExtensions(spark.sparkContext)

  private def freshWh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_analyze_$tag").toString

  test("ANALYZE TABLE is metadata-served: succeeds with every data file gone") {
    val wh = freshWh("meta")
    val cat = "anlz"
    xspark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    xspark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    xspark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    xspark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    xspark.sql(s"INSERT INTO $cat.db.t SELECT id, id * 10 FROM range(0, 500)")
    // destroy the data: any ANALYZE that scans now throws
    val dataDir = java.nio.file.Paths.get(wh, "db", "t", "data")
    java.nio.file.Files.walk(dataDir).sorted(java.util.Comparator.reverseOrder())
      .filter(p => p.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.delete(p))
    xspark.sql(s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS")
    xspark.sql(s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR ALL COLUMNS")
    val t = new graft.sources.SnapshotTable(spark, s"$wh/db/t", Seq("id"))
    val props = t.tableProperties
    assert(props.get("stats.rows").contains("500"), s"got $props")
    assert(props.get("stats.bytes").exists(_.toLong > 0L))
    assert(props.get("stats.analyzed_version").contains(t.latestVersion().toString))
    assert(props.get("stats.col.id.ndv").exists(_.toLong > 400L),
      s"HLL NDV estimate must land in properties: $props")
    assert(props.get("stats.col.id.nulls").contains("0"))
    assert(props.get("stats.col.id.min_key").contains("0") &&
      props.get("stats.col.id.max_key").contains("499"))
  }

  test("the CBO consumes the manifest stats: exact rowCount, broadcast-sized") {
    val wh = freshWh("cbo")
    val cat = "anlzc"
    xspark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    xspark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    xspark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    xspark.sql(s"CREATE TABLE $cat.db.dim (id BIGINT, name STRING) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    xspark.sql(s"INSERT INTO $cat.db.dim " +
      "SELECT id, concat('n', id) FROM range(0, 100)")
    xspark.sql(s"ANALYZE TABLE $cat.db.dim COMPUTE STATISTICS")
    // rowCount propagates into plan stats under the CBO estimator (the
    // default size-only visitor ignores it by design)
    xspark.conf.set("spark.sql.cbo.enabled", "true")
    val stats =
      try xspark.table(s"$cat.db.dim").queryExecution.optimizedPlan.stats
      finally xspark.conf.unset("spark.sql.cbo.enabled")
    assert(stats.rowCount.contains(BigInt(100)),
      s"manifest row count must reach the CBO, got $stats")
    // the small side auto-broadcasts off those reported stats
    xspark.range(0, 100000).toDF("id").createOrReplaceTempView("anlz_fact")
    val joined = xspark.sql(
      s"SELECT f.id, d.name FROM anlz_fact f JOIN $cat.db.dim d ON f.id = d.id")
    assert(joined.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      s"got:\n${joined.queryExecution.sparkPlan}")
  }

  test("non-graft statements and non-graft ANALYZE delegate untouched") {
    // ordinary SQL still parses through the delegate
    assert(xspark.sql("SELECT 1 + 1 AS x").as[Int].head() == 2)
    // ANALYZE on a session-catalog v1 table takes Spark's own path
    xspark.sql("DROP TABLE IF EXISTS anlz_v1")
    xspark.sql("CREATE TABLE anlz_v1 (id BIGINT) USING parquet")
    xspark.sql("INSERT INTO anlz_v1 VALUES (1), (2)")
    xspark.sql("ANALYZE TABLE anlz_v1 COMPUTE STATISTICS")
    assert(xspark.table("anlz_v1").count() == 2L)
    xspark.sql("DROP TABLE anlz_v1")
  }

  test("FOR COLUMNS on a column without manifest stats refuses with guidance") {
    val wh = freshWh("refuse")
    val cat = "anlzr"
    xspark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    xspark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    xspark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    xspark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='id')")
    xspark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM range(0, 10)")
    val e = intercept[Exception](
      xspark.sql(s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS v"))
    assert(e.getMessage.contains("stats_cols"),
      s"must point at the stats_cols fix, got: ${e.getMessage}")
  }
}
