package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** `repairTable` — the recovery verb paired with `checkTable`: re-list
  * the tip without the files storage lost or corrupted so the table
  * reads again, with exact row accounting (metadata-served when
  * provable, one kept-side recount otherwise) and an explicit gate on
  * dropping delete files (resurrection). */
class RepairTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_repair_$tag")
    f.toFile.delete()
    f.toString
  }

  private def dataFileOf(root: String, rel: String): java.io.File =
    new java.io.File(new java.io.File(root, "data"), rel)

  test("missing data file: dry run reports, real run re-lists, reads recover") {
    val root = freshRoot("missing")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 100).toDF("k").repartition(1))
    t.commitAppend(spark.range(100, 250).toDF("k").repartition(1))
    val s = t.snapshot(t.latestVersion())
    // damage the file holding [0, 99] — identified by its band, not name
    val victim = s.files(s.stats.head.mins.indexOf(0L))
    assert(dataFileOf(root, victim).delete(), "fixture must delete the file")
    intercept[Exception] { t.read(t.latestVersion()).count() }
    val dry = t.repairTable()
    assert(dry.committed.isEmpty && dry.droppedFiles == Seq(victim))
    assert(dry.rowsBefore == 250L && dry.rowsAfter == 150L,
      s"cheap metadata accounting must serve the dry run: $dry")
    assert(t.latestVersion() == s.version, "dry run must publish nothing")
    val r = t.repairTable(dryRun = false)
    assert(r.committed.contains(s.version + 1) && r.rowsAfter == 150L, s"$r")
    assert(t.read(t.latestVersion()).count() == 150L)
    assert(t.read(t.latestVersion()).agg(min(col("k"))).head.getLong(0) == 100L)
    assert(t.checkTable().ok, "fsck must be green after repair")
    assert(t.snapshot(t.latestVersion()).rows == 150L)
  }

  test("truncated data file (length mismatch) is dropped like a missing one") {
    val root = freshRoot("trunc")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 50).toDF("k").repartition(1))
    t.commitAppend(spark.range(50, 80).toDF("k").repartition(1))
    val s = t.snapshot(t.latestVersion())
    val victim = s.files(s.stats.head.mins.indexOf(50L))
    val f = dataFileOf(root, victim)
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(f.length() / 2) finally ch.close()
    val r = t.repairTable(dryRun = false)
    assert(r.droppedFiles == Seq(victim) && r.rowsAfter == 50L, s"$r")
    assert(t.read(t.latestVersion()).count() == 50L)
    assert(t.checkTable().ok)
  }

  test("nothing damaged: no version published, report says so") {
    val t = new SnapshotTable(spark, freshRoot("clean"), statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 10).toDF("k"))
    val before = t.latestVersion()
    val r = t.repairTable(dryRun = false)
    assert(r.committed.isEmpty && r.droppedFiles.isEmpty &&
      r.rowsBefore == 10L && r.rowsAfter == 10L)
    assert(t.latestVersion() == before)
  }

  test("damaged delete file: refused by default, dropped only with the flag " +
      "(resurrection acknowledged), recount pays the exact row accounting") {
    val root = freshRoot("deldrop")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 100).toDF("k").repartition(1))
    t.commitDeleteByKey(spark.range(0, 20).toDF("k").repartition(1), Seq("k"))
    assert(t.read(t.latestVersion()).count() == 80L)
    val s = t.snapshot(t.latestVersion())
    assert(s.deletes.length == 1, "construction: one equality-delete file")
    assert(dataFileOf(root, s.deletes.head).delete())
    val ex = intercept[IllegalArgumentException] { t.repairTable(dryRun = false) }
    assert(ex.getMessage.contains("RESURRECT"), s"got: ${ex.getMessage}")
    val r = t.repairTable(dryRun = false, dropDeletes = true)
    assert(r.droppedDeletes == Seq(s.deletes.head) && r.droppedFiles.isEmpty)
    // the delete's 20 keys resurrect: exact accounting needs the recount
    assert(r.rowsAfter == 100L, s"$r")
    assert(t.read(t.latestVersion()).count() == 100L)
    assert(t.checkTable().ok)
  }

  test("MOR-affected damaged data file: recount (not metadata) serves rows") {
    val root = freshRoot("morfile")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 100).toDF("k").repartition(1))
    t.commitAppend(spark.range(100, 160).toDF("k").repartition(1))
    // delete straddles both files: 10 keys in the victim, 10 in the kept
    t.commitDeleteByKey((spark.range(90, 110)).toDF("k"), Seq("k"))
    assert(t.read(t.latestVersion()).count() == 140L)
    val s = t.snapshot(t.latestVersion())
    val victim = s.files(s.stats.head.mins.indexOf(0L))
    assert(dataFileOf(root, victim).delete())
    val dry = t.repairTable()
    assert(dry.rowsAfter == -1L,
      s"a dry run must not pay the recount scan: $dry")
    val r = t.repairTable(dryRun = false)
    // kept file holds [100,160) minus deleted [100,110) = 50 live rows
    assert(r.rowsAfter == 50L, s"$r")
    assert(t.read(t.latestVersion()).count() == 50L)
    assert(t.checkTable().ok)
  }

  test("all data files damaged: refused — that table restores, not repairs") {
    val root = freshRoot("total")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 10).toDF("k").repartition(1))
    val s = t.snapshot(t.latestVersion())
    assert(dataFileOf(root, s.files.head).delete())
    val ex = intercept[IllegalArgumentException] { t.repairTable(dryRun = false) }
    assert(ex.getMessage.contains("every data file"))
  }

  test("change feed refuses a repair version with reseed guidance; " +
      "windows past it serve") {
    val root = freshRoot("cdf")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 40).toDF("k").repartition(1))   // v1
    t.commitAppend(spark.range(40, 90).toDF("k").repartition(1))  // v2
    val s = t.snapshot(t.latestVersion())
    val victim = s.files(s.stats.head.mins.indexOf(0L))
    assert(dataFileOf(root, victim).delete())
    val r = t.repairTable(dryRun = false)                          // v3
    val v3 = r.committed.get
    val ex = intercept[RuntimeException] { t.readChangeFeed(0L, v3).count() }
    assert(ex.getMessage.contains("reseed"), s"got: ${ex.getMessage}")
    t.commitAppend(spark.range(90, 95).toDF("k"))                  // v4
    assert(t.readChangeFeed(v3, v3 + 1).count() == 5L,
      "windows strictly past the repair must serve normally")
  }

  test("repair scopes to the handle's chain: a branch repairs itself, " +
      "main's tip is untouched") {
    val root = freshRoot("branch")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 50).toDF("k").repartition(1))
    t.createBranch("fix")
    val b = t.branch("fix")
    b.commitAppend(spark.range(50, 80).toDF("k").repartition(1))
    val bs = b.snapshot(b.latestVersion())
    val victim = bs.files(bs.stats.head.mins.indexOf(50L))
    assert(dataFileOf(root, victim).delete()) // branch-only staged file
    val mainTip = t.latestVersion()
    val r = b.repairTable(dryRun = false)
    assert(r.droppedFiles == Seq(victim) && r.rowsAfter == 50L, s"$r")
    assert(b.read(b.latestVersion()).count() == 50L)
    assert(t.latestVersion() == mainTip, "main must not gain a version")
    assert(t.read(mainTip).count() == 50L, "main reads untouched")
  }

  test("distributed probe path: fsck and repair agree with driver-side probes") {
    val root = freshRoot("distprobe")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 90).toDF("k").repartition(3))
    t.commitAppend(spark.range(90, 120).toDF("k").repartition(1))
    val s = t.snapshot(t.latestVersion())
    val victim = s.files(s.stats.head.mins.indexOf(90L))
    assert(dataFileOf(root, victim).delete())
    // force the executor-side probe job (threshold 2 << 4 files)
    spark.conf.set("spark.graft.fsck.distributedProbeAt", "2")
    try {
      val chk = t.checkTable()
      assert(!chk.ok && chk.missingFiles == Seq(victim), s"$chk")
      val r = t.repairTable(dryRun = false)
      assert(r.droppedFiles == Seq(victim) && r.rowsAfter == 90L, s"$r")
      assert(t.checkTable().ok)
    } finally spark.conf.unset("spark.graft.fsck.distributedProbeAt")
  }

  test("CALL repair_table: the SQL surface end to end") {
    val wh = freshRoot("sql")
    val cat = "grep1"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT) USING `graft-snapshot` " +
      "TBLPROPERTIES('stats_cols'='k')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(100, 130)")
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    val s = t.snapshot(t.latestVersion())
    val victim = s.files(s.stats.head.mins.indexOf(100L))
    assert(dataFileOf(s"$wh/db/t", victim).delete())
    val dry = spark.sql(s"CALL $cat.system.repair_table('db.t')")
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    assert(dry._2 == 1L && dry._5 == 100L && dry._6.isEmpty, s"got $dry")
    val run = spark.sql(
      s"CALL $cat.system.repair_table('db.t', dry_run => false)")
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    assert(run._6.nonEmpty && run._5 == 100L, s"got $run")
    assert(spark.table(s"$cat.db.t").count() == 100L)
  }
}
