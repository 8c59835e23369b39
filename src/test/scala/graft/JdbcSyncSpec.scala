package graft

import java.sql.DriverManager
import java.util.Properties
import graft.sources.Sources
import graft.sync.DimSync

/** S8/S9 exercised end-to-end against a real SQL store: embedded Derby
  * (in Spark's runtime jars) stands in for the reference's PostgreSQL
  * target. Covers the JDBC read (sync_data.py:126-134), the set-based
  * write-back (:242-268), and the full syncDimension round trip —
  * insert-missing, id continuation, stale deletion, idempotence. */
class JdbcSyncSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  // Derby's driver self-registers with DriverManager (service loader), so
  // no explicit driver class is needed — Spark resolves it from the URL.
  private def props: Properties = new Properties()

  private def withTable(ddlRows: Seq[(Long, String)])(body: String => Unit): Unit = {
    val table = s"dim_${System.nanoTime()}"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        s"CREATE TABLE $table (id BIGINT NOT NULL, name VARCHAR(255) NOT NULL)")
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
      ddlRows.foreach { case (id, n) => ps.setLong(1, id); ps.setString(2, n); ps.addBatch() }
      ps.executeBatch()
    } finally conn.close()
    body(table)
  }

  test("readJdbc scans a relational dimension (S8)") {
    withTable(Seq(1L -> "google", 2L -> "meta")) { table =>
      val dim = Sources.readJdbc(spark, url, table, props)
      assert(dim.columns.map(_.toLowerCase).toSeq == Seq("id", "name"))
      assert(dim.collect().map(r => r.getLong(0) -> r.getString(1)).toSet ==
        Set(1L -> "google", 2L -> "meta"))
    }
  }

  test("writeJdbc appends set-based (S9, replacing the row-at-a-time loop)") {
    withTable(Seq(1L -> "google")) { table =>
      Sources.writeJdbc(Seq((2L, "meta"), (3L, "tiktok")).toDF("id", "name"),
        url, table, props)
      val back = Sources.readJdbc(spark, url, table, props).collect()
      assert(back.length == 3)
    }
  }

  test("syncDimensionJdbc: insert missing, continue ids, delete stale, idempotent") {
    withTable(Seq(1L -> "google", 2L -> "meta", 3L -> "legacy_channel")) { table =>
      val source = Seq("google", "meta", "tiktok", "snap", "tiktok", null)
        .toDF("channel")
      val (ins, del) = DimSync.syncDimensionJdbc(spark, source, "channel", url, table, props)
      assert(ins == 2 && del == 1) // +tiktok +snap, -legacy_channel
      val dim = Sources.readJdbc(spark, url, table, props).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(dim == Map(1L -> "google", 2L -> "meta", 4L -> "snap", 5L -> "tiktok"))

      // second run is a no-op (INSERT WHERE NOT EXISTS semantics, J6)
      val (ins2, del2) = DimSync.syncDimensionJdbc(spark, source, "channel", url, table, props)
      assert(ins2 == 0 && del2 == 0)
      assert(Sources.readJdbc(spark, url, table, props).count() == 4)
    }
  }
}
