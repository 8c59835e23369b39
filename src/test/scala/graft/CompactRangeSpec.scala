package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Band-scoped compaction (OPTIMIZE WHERE): fold only the files whose
  * band overlaps a hot key window, re-listing cold files by identity.
  * Pinned: cold-file identity, dataChange=false, value equivalence,
  * MOR-delete absorption for rewritten files with cold files still
  * served through the anti-join, the no-op contract under <2
  * overlapping files, and the CALL surface. */
class CompactRangeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_crange_$tag")
    f.toFile.delete()
    f.toString
  }

  test("folds only the hot band; cold file survives by identity; dataChange=false") {
    val t = new SnapshotTable(spark, freshRoot("fold"), statsCols = Seq("k"))
    t.commitAppend((0L until 1000L).map(k => (k, k)).toDF("k", "v").repartition(1)) // cold
    (0 until 4).foreach(i => t.commitAppend( // four hot micro-files
      (2000L + i * 10 until 2010L + i * 10).map(k => (k, k)).toDF("k", "v")
        .repartition(1)))
    val before = t.snapshot(t.latestVersion())
    val v = t.compactRange("k", 2000L, 3000L, targetRowsPerFile = 100L)
    val after = t.snapshot(v)
    assert(!after.dataChange && after.action == "compact")
    assert(after.files.length == 2, s"cold + one folded hot, got ${after.files}")
    val cold = before.files.head
    assert(after.files.contains(cold), "the cold file must survive by identity")
    assert(t.read().count() == 1040L)
    assert(t.read().filter(col("k") >= 2000L).count() == 40L)
    // recorded row counts survive the fold (cold keeps, hot re-records)
    assert(t.filesMetadata(v).filter(_.content == "data").map(_.rows).sorted ==
      Seq(40L, 1000L))
  }

  test("MOR deletes absorb into the rewritten band, keep applying to cold files") {
    val t = new SnapshotTable(spark, freshRoot("mor"), statsCols = Seq("k"))
    t.commitAppend((0L until 100L).map(k => (k, k)).toDF("k", "v").repartition(1))
    (0 until 2).foreach(i => t.commitAppend(
      (200L + i * 10 until 210L + i * 10).map(k => (k, k)).toDF("k", "v")
        .repartition(1)))
    t.commitDeleteByKey(Seq(5L, 205L).toDF("k"), Seq("k"))
    val v = t.compactRange("k", 200L, 300L, targetRowsPerFile = 1000L)
    val snap = t.snapshot(v)
    assert(snap.deletes.nonEmpty, "the delete file stays for the cold files")
    assert(t.read().select("k").as[Long].collect().toSet ==
      ((0L until 100L).toSet - 5L) ++ ((200L until 220L).toSet - 205L))
    // the rewritten hot file materialized its delete: rows are exact
    assert(snap.rows == 118L)
  }

  test("fewer than two overlapping files is a no-op; CALL surface works") {
    val cat = "gcrg"
    val wh = freshRoot("call")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='k')")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t SELECT id, id FROM range(${i * 100}, ${i * 100 + 100})"))
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    val tip = t.latestVersion()
    // the [400, 500] window overlaps nothing: tip unchanged
    assert(t.compactRange("k", 400L, 500L, 50L) == tip)
    // CALL folds the [0, 199] window (two files) into range-sized files
    val r = spark.sql(
      s"CALL $cat.system.compact_range('db.t', 'k', 0, 199, 1000)")
      .as[(Long, Long)].head()
    assert(r._1 == tip + 1)
    assert(spark.table(s"$cat.db.t").count() == 300L)
    val after = t.snapshot(t.latestVersion())
    assert(after.files.exists(t.snapshot(tip).files.contains),
      "the third file (k in [200,300)) must survive by identity")
  }
}
