package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Minor compaction of merge-on-read delete files: N accumulated
  * equality-delete files fold into one per applicability class with NO
  * data file touched — the cheap maintenance step between full
  * compactions. The fold must preserve the sequencing rule exactly: a
  * delete applies only to data files with strictly smaller sequences,
  * so deletes straddling an append (a re-inserted key) never merge. */
class MorCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_morcomp_$tag")
    f.toFile.delete()
    f.toString
  }

  test("N back-to-back MOR deletes fold into ONE delete file; contents and data files untouched") {
    val root = freshRoot("fold")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend((1L to 12L).map(k => (k, s"row$k")).toDF("k", "s"))
    (1L to 3L).foreach(k =>
      t.commitDeleteByKey(Seq(Tuple1(k)).toDF("k"), Seq("k")))
    val before = t.snapshot(t.latestVersion())
    assert(before.deletes.length == 3)
    val v = t.compactDeletes()
    val after = t.snapshot(v)
    assert(after.deletes.length == 1, "3 same-class delete files must fold to 1")
    assert(after.files == before.files, "minor compaction must not touch data files")
    assert(!after.dataChange, "a fold changes no contents — feeds must skip it")
    assert(after.rows == before.rows)
    assert(t.read().select("k").as[Long].collect().toSet == (4L to 12L).toSet)
    // the change feed sees nothing new across the fold
    val (appends, changes) = t.appendDelta(before.version, v)
    assert(appends.isEmpty && changes.isEmpty)
    // idempotent: already-minimal tables publish no further version
    assert(t.compactDeletes() == v)
  }

  test("deletes straddling an append never merge — a re-inserted key survives the fold") {
    val root = freshRoot("reinsert")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")) // v1
    t.commitDeleteByKey(Seq(Tuple1(1L)).toDF("k"), Seq("k"))            // v2: kill k=1
    t.commitAppend(Seq((1L, "a2")).toDF("k", "s"))                      // v3: re-insert k=1
    t.commitDeleteByKey(Seq(Tuple1(2L)).toDF("k"), Seq("k"))            // v4
    t.commitDeleteByKey(Seq(Tuple1(3L)).toDF("k"), Seq("k"))            // v5
    val v = t.compactDeletes()
    val after = t.snapshot(v)
    // v4+v5 share an applicability cut (both postdate the re-insert) and
    // merge; v2's delete predates it and must stay separate
    assert(after.deletes.length == 2,
      s"expected 2 classes, got ${after.deletes.length} (${after.deleteSeqs})")
    assert(t.read().select("k", "s").as[(Long, String)].collect().toSet ==
      Set((1L, "a2")), "the re-inserted row must survive the fold")
    assert(t.read().count() == 1L)
    // and the surviving row is the re-inserted one, not the original
    assert(t.read().select("s").as[String].collect().toSeq == Seq("a2"))
  }

  test("compactFiles rewrites ONLY sub-threshold files; big files survive by identity") {
    val root = freshRoot("smallfiles")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    // one big file, then a stream of small appends (the sink-debris shape)
    t.commitAppend(spark.range(1L, 50001L).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartition(1))
    (0 until 5).foreach(i =>
      t.commitAppend(Seq((100000L + i, 7L)).toDF("k", "v").repartition(1)))
    val before = t.snapshot(t.latestVersion())
    assert(before.files.length == 6)
    val bigFile = before.files.head // the 50k-row file (first committed)
    // a MOR delete straddles the fold: it must stay correct through it
    t.commitDeleteByKey(Seq(Tuple1(100001L)).toDF("k"), Seq("k"))
    val v = t.compactFiles(minFileBytes = 100 * 1024, targetFileBytes = 128 * 1024 * 1024)
    val after = t.snapshot(v)
    assert(after.files.contains(bigFile),
      "the big file must be re-listed by identity, never rewritten")
    assert(after.files.length == 2,
      s"5 small files must fold into one: ${after.files.length}")
    assert(!after.dataChange && after.rows == before.rows - 1)
    // contents exact: deleted row stays gone, everything else survives
    assert(t.read().filter(col("k") >= 100000L).select("k").as[Long]
      .collect().toSet == Set(100000L, 100002L, 100003L, 100004L))
    assert(t.read().count() == 50004L)
    // idempotent: one small file left -> no further version
    assert(t.compactFiles(100 * 1024, 128 * 1024 * 1024) == v)
    // partial rewrites NEVER upgrade band semantics (inherit only)
    assert(after.bandsV == before.bandsV)
  }

  test("CALL system.compact_files folds sink debris by name") {
    val wh = freshRoot("sqlsmall")
    spark.conf.set("spark.sql.catalog.gcf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcf.db")
    spark.sql("CREATE TABLE gcf.db.t (k BIGINT, v BIGINT) USING `graft-snapshot` " +
      "TBLPROPERTIES('stats_cols'='k')")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO gcf.db.t VALUES ($i, ${i * 10})"))
    val row = spark.sql(
      "CALL gcf.system.compact_files('db.t', 1048576, 134217728)").collect().head
    assert(row.getLong(1) == 1L, s"4 tiny inserts must fold to 1 file: ${row.getLong(1)}")
    assert(spark.table("gcf.db.t").count() == 4L)
    assert(spark.table("gcf.db.t").agg(sum(col("v"))).as[Long].collect().head == 100L)
  }

  test("write.delete.compact.at auto-folds delete files after the threshold DML") {
    val wh = freshRoot("autofold")
    spark.conf.set("spark.sql.catalog.gaf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gaf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gaf.db")
    // threshold validation is DDL-loud
    val bad = intercept[Exception](spark.sql(
      "CREATE TABLE gaf.db.bad (k BIGINT) USING `graft-snapshot` " +
        "TBLPROPERTIES('write.delete.compact.at'='one')"))
    assert(bad.getMessage.contains("write.delete.compact.at"), bad.getMessage)
    spark.sql("CREATE TABLE gaf.db.t (k BIGINT, v BIGINT) USING `graft-snapshot` " +
      "TBLPROPERTIES('stats_cols'='k', 'write.delete.mode'='merge-on-read', " +
      "'write.delete.key'='k', 'write.delete.compact.at'='3')")
    spark.sql("INSERT INTO gaf.db.t SELECT id, id * 10 FROM range(1, 21)")
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    spark.sql("DELETE FROM gaf.db.t WHERE k = 1")
    spark.sql("DELETE FROM gaf.db.t WHERE k = 2")
    assert(t.snapshot(t.latestVersion()).deletes.length == 2,
      "below the threshold: no fold yet")
    spark.sql("DELETE FROM gaf.db.t WHERE k = 3") // third file trips the fold
    val tip = t.snapshot(t.latestVersion())
    assert(tip.deletes.length == 1,
      s"the 3rd MOR DELETE must auto-fold to 1 delete file: ${tip.deletes.length}")
    assert(tip.action == "compact_deletes" && !tip.dataChange)
    assert(spark.table("gaf.db.t").count() == 17L)
    assert(spark.table("gaf.db.t").agg(min(col("k"))).as[Long].collect().head == 4L)
  }

  test("expire_snapshots drops versions older than a wall-clock cutoff, tip survives") {
    val root = freshRoot("expire")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    (1 to 4).foreach(i =>
      t.commitAppend(Seq((i.toLong, i.toLong * 10)).toDF("k", "v").repartition(1)))
    val h = t.history()
    // cutoff strictly after v2's commit: v1-v2 expire, v3-v4 stay
    val cutoff = h.find(_.version == 3L).get.ts
    val retained = t.expireSnapshots(cutoff)
    assert(retained == 2, s"expected 2 retained versions, got $retained")
    assert(t.history().map(_.version) == Seq(3L, 4L))
    // tip contents intact; expired versions no longer readable from a
    // FRESH handle (a live handle may still serve them from its
    // immutable-manifest cache — vacuum is GC, not a semantic change)
    assert(t.read().count() == 4L)
    intercept[Exception](
      new SnapshotTable(spark, root, statsCols = Seq("k")).read(1L).count())
    // a cutoff in the future still keeps the tip (never expire everything)
    val kept = t.expireSnapshots(System.currentTimeMillis() + 3600L * 1000)
    assert(kept == 1 && t.read().count() == 4L)
    // SQL surface
    val wh = freshRoot("expiresql")
    spark.conf.set("spark.sql.catalog.gex", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gex.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gex.db")
    spark.sql("CREATE TABLE gex.db.t (k BIGINT) USING `graft-snapshot`")
    spark.sql("INSERT INTO gex.db.t VALUES (1)")
    val row = spark.sql(
      s"CALL gex.system.expire_snapshots('db.t', ${System.currentTimeMillis() + 60000})")
      .collect().head
    assert(row.getLong(1) == 1L && spark.table("gex.db.t").count() == 1L)
  }

  test("CALL system.compact_deletes folds a SQL MOR table's delete files") {
    val wh = freshRoot("sqlfold")
    spark.conf.set("spark.sql.catalog.gmc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmc.db")
    spark.sql("CREATE TABLE gmc.db.t (k BIGINT, v BIGINT) USING `graft-snapshot` " +
      "TBLPROPERTIES('stats_cols'='k', 'write.delete.mode'='merge-on-read', " +
      "'write.delete.key'='k')")
    spark.sql("INSERT INTO gmc.db.t SELECT id, id * 10 FROM range(1, 21)")
    (1 to 4).foreach(k => spark.sql(s"DELETE FROM gmc.db.t WHERE k = $k"))
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    assert(t.snapshot(t.latestVersion()).deletes.length == 4)
    val row = spark.sql("CALL gmc.system.compact_deletes('db.t')").collect().head
    assert(row.getLong(1) == 1L, s"expected 1 folded delete file, got ${row.getLong(1)}")
    assert(spark.table("gmc.db.t").count() == 16L)
    assert(spark.table("gmc.db.t").agg(sum(col("v"))).as[Long].collect().head ==
      (5L to 20L).map(_ * 10).sum)
  }
}
