package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The format's fsck: a healthy table reports ok with reconciled row
  * counts; a deleted data file, a truncated file, and a row-count drift
  * are each detected and named. */
class CheckTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_fsck_$tag")
    f.toFile.delete()
    f.toString
  }

  test("healthy table: ok, counts reconcile, deep recount agrees through MOR") {
    val root = freshRoot("ok")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    Seq(0L, 100L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k)).toDF("k", "v").repartition(1)))
    val r = t.checkTable()
    assert(r.ok && r.files == 2L && r.deletes == 0L)
    assert(r.rowsFromCounts.contains(200L) && r.rowsRecorded == 200L)
    // MOR deletes: the counts lane declines (counts are physical), the
    // deep lane recounts LIVE rows and still reconciles
    t.commitDeleteByKey(Seq(5L).toDF("k"), Seq("k"))
    val r2 = t.checkTable(deep = true)
    assert(r2.ok && r2.rowsFromCounts.isEmpty && r2.rowsDeepScan.contains(199L))
  }

  test("a missing data file and a truncated file are detected and named") {
    val root = freshRoot("broken")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    Seq(0L, 100L, 200L).foreach(b => t.commitAppend(
      (b until b + 100L).map(k => (k, k)).toDF("k", "v").repartition(1)))
    val files = t.snapshot(t.latestVersion()).files
    val victim = new java.io.File(s"$root/data/${files.head}")
    val truncated = new java.io.File(s"$root/data/${files(1)}")
    assert(victim.delete())
    val ch = new java.io.RandomAccessFile(truncated, "rw")
    ch.setLength(ch.length() - 10); ch.close()
    val r = t.checkTable()
    assert(!r.ok)
    assert(r.missingFiles == Seq(files.head))
    assert(r.lengthMismatches == Seq(files(1)))
  }

  test("CALL surface returns the one-row report") {
    val cat = "gfsck"
    val wh = freshRoot("call")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT) USING `graft-snapshot`")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(0, 50)")
    val row = spark.sql(s"CALL $cat.system.check_table('db.t', true)").collect().head
    assert(row.getAs[Long]("rows_recorded") == 50L)
    assert(row.getAs[Long]("rows_checked") == 50L)
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Long]("missing") == 0L)
  }
}
