package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Delete-file row counts (`drows`) + delete-key bands (`dmins`/`dmaxs`)
  * in the manifest — the record_count idea extended to the MOR delete
  * side: each equality-delete file records how many keys it holds
  * (exactly the rows it removed when committed; an upper bound forever
  * after) and the key band those keys span. fsck then reconciles a MOR
  * table from METADATA (live rows must lie in [Σfrows − Σdrows,
  * Σfrows]) and countRange serves files whose applicable deletes are
  * band-disjoint without scanning. */
class DeleteRowCountsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_drows_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Three band-disjoint files over day ∈ [1,10], [11,20], [21,30]. */
  private def threeFiles(t: SnapshotTable): Unit =
    Seq(1L, 11L, 21L).foreach { lo =>
      t.commitAppend(spark.range(lo, lo + 10).toDF("day")
        .withColumn("v", col("day") * 10L).repartition(1))
    }

  test("engine MOR delete records drows + key band; fsck bounds reconcile") {
    val t = new SnapshotTable(spark, freshRoot("engine"), statsCols = Seq("day"))
    threeFiles(t)
    t.commitDeleteByKey(Seq(25L, 26L, 27L).toDF("day"), Seq("day"))
    val snap = t.snapshot(t.latestVersion())
    assert(snap.deletes.length == 1)
    assert(snap.drows == Seq(3L), s"expected key count 3, got ${snap.drows}")
    assert(snap.dmins == Seq(25L) && snap.dmaxs == Seq(27L),
      s"expected band [25,27], got ${snap.dmins}/${snap.dmaxs}")
    // metadata-mode fsck: rows (27) within [Σfrows − Σdrows, Σfrows] = [27, 30]
    val r = t.checkTable()
    assert(r.rowsBounds.contains((27L, 30L)), s"got ${r.rowsBounds}")
    assert(r.rowsRecorded == 27L && r.ok, s"got $r")
    // and the bound is tight here (nothing absorbed): lo == rows
  }

  test("countRange serves MOR-affected files when deletes are band-disjoint") {
    val t = new SnapshotTable(spark, freshRoot("count"), statsCols = Seq("day"))
    threeFiles(t)
    t.commitDeleteByKey(Seq(25L, 26L).toDF("day"), Seq("day"))
    // file [1,10]: every delete outsequences it, but the delete band
    // [25,26] misses its key band — served from recorded counts
    val (n1, scanned1) = t.countRangeDetailed("day", 1L, 10L, -1L)
    assert(n1 == 10L && scanned1.isEmpty,
      s"band-disjoint MOR file must serve from metadata, got $n1 / $scanned1")
    // file [21,30]: the delete band overlaps — a real scan, exact count
    val (n3, scanned3) = t.countRangeDetailed("day", 21L, 30L, -1L)
    assert(n3 == 8L && scanned3.nonEmpty, s"got $n3 / $scanned3")
  }

  test("SQL MOR DELETE records drows; CALL check_table reports rows_lo/rows_hi") {
    val wh = freshRoot("sql")
    val cat = "drws"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (day BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='day', " +
      "'write.delete.mode'='merge-on-read', 'write.delete.key'='day')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id AS day, id * 10 AS v " +
      "FROM range(1, 31)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE day IN (5, 6, 7, 8)")
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("day"))
    val snap = t.snapshot(t.latestVersion())
    assert(snap.deletes.nonEmpty && snap.drows.sum == 4L,
      s"SQL delete must record per-file key counts, got ${snap.drows}")
    assert(snap.dmins.min == 5L && snap.dmaxs.max == 8L,
      s"got ${snap.dmins}/${snap.dmaxs}")
    val row = spark.sql(s"CALL $cat.system.check_table('db.t')")
      .select("rows_recorded", "rows_lo", "rows_hi", "ok")
      .as[(Long, Option[Long], Option[Long], Boolean)].head()
    assert(row._1 == 26L && row._4, s"got $row")
    assert(row._2.exists(_ <= 26L) && row._3.exists(_ >= 26L),
      s"metadata bounds must bracket the recorded rows, got $row")
  }

  test("compactDeletes folds drows (distinct keys) and the folded band") {
    val t = new SnapshotTable(spark, freshRoot("fold"), statsCols = Seq("day"))
    threeFiles(t)
    t.commitDeleteByKey(Seq(25L).toDF("day"), Seq("day"))
    t.commitDeleteByKey(Seq(27L, 25L).toDF("day"), Seq("day"))
    // same applicability class (no data commit between) -> one folded file
    t.compactDeletes()
    val snap = t.snapshot(t.latestVersion())
    assert(snap.action == "compact_deletes" && snap.deletes.length == 1)
    assert(snap.drows == Seq(2L), // 25 deduped across the class
      s"folded key count must be the distinct union, got ${snap.drows}")
    assert(snap.dmins == Seq(25L) && snap.dmaxs == Seq(27L))
    // the fold keeps disjoint files metadata-servable
    val (n1, scanned1) = t.countRangeDetailed("day", 1L, 10L, -1L)
    assert(n1 == 10L && scanned1.isEmpty)
    // and fsck still bounds: rows (28) ∈ [30 − 2, 30]
    assert(t.checkTable().rowsBounds.contains((28L, 30L)))
  }

  test("fsck FLAGS a manifest whose row count violates the MOR bounds") {
    val root = freshRoot("tamper")
    val t = new SnapshotTable(spark, root, statsCols = Seq("day"))
    threeFiles(t)
    t.commitDeleteByKey(Seq(25L).toDF("day"), Seq("day"))
    assert(t.checkTable().ok)
    // corrupt the tip manifest's recorded row count ABOVE the
    // metadata bound Σfrows — a lying manifest the bounds must catch
    // without any scan
    val tip = t.latestVersion()
    val mpath = java.nio.file.Paths.get(root, "_snapshots", f"v$tip%020d.json")
    val body = new String(java.nio.file.Files.readAllBytes(mpath), "UTF-8")
    val rows = """"rows":(\d+)""".r.findFirstMatchIn(body).get.group(1).toLong
    java.nio.file.Files.write(mpath, body.replaceFirst(
      """"rows":\d+""", s""""rows":${rows + 100}""").getBytes("UTF-8"))
    val r = new SnapshotTable(spark, root, Seq("day")).checkTable()
    assert(!r.ok && r.rowsBounds.exists { case (_, hi) => r.rowsRecorded > hi },
      s"metadata-mode fsck must catch the bounds violation, got $r")
  }

  test("COMPOSITE key: engine MOR delete records a z-band; countRange serves disjoint files") {
    val t = new SnapshotTable(spark, freshRoot("zeng"),
      statsCols = Seq("day", "region"))
    // three files band-disjoint on BOTH key columns (day ascending,
    // region ascending) — their z boxes are disjoint too
    Seq((1L, 100L), (11L, 200L), (21L, 300L)).foreach { case (lo, r0) =>
      t.commitAppend(spark.range(lo, lo + 10).toDF("day")
        .withColumn("region", col("day") - lo + r0)
        .withColumn("v", col("day") * 10L).repartition(1))
    }
    t.commitDeleteByKey(
      Seq((25L, 304L), (26L, 305L)).toDF("day", "region"),
      Seq("day", "region"))
    val snap = t.snapshot(t.latestVersion())
    assert(snap.drows == Seq(2L), s"got ${snap.drows}")
    assert(snap.dmins.head != Long.MinValue && snap.dmaxs.head != Long.MaxValue,
      s"composite delete must record a z-band, not the sentinel: " +
        s"${snap.dmins}/${snap.dmaxs}")
    // file [1,10]x[100,109]: outsequenced by the delete, but its z box
    // misses the delete's z band — served from recorded counts
    val (n1, scanned1) = t.countRangeDetailed("day", 1L, 10L, -1L)
    assert(n1 == 10L && scanned1.isEmpty,
      s"z-band-disjoint MOR file must serve from metadata, got $n1 / $scanned1")
    // file [21,30]x[300,309]: the delete's keys live inside — real scan
    val (n3, scanned3) = t.countRangeDetailed("day", 21L, 30L, -1L)
    assert(n3 == 8L && scanned3.nonEmpty, s"got $n3 / $scanned3")
    // fsck MOR bounds still reconcile from drows
    assert(t.checkTable().rowsBounds.contains((28L, 30L)))
  }

  test("COMPOSITE key: SQL MOR DELETE through the DSv2 writer records the z-band") {
    val wh = freshRoot("zsql")
    val cat = "drwz"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (day BIGINT, region BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='day,region', " +
      "'write.delete.mode'='merge-on-read', 'write.delete.key'='day,region')")
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT id AS day, id + 100 AS region, id * 10 AS v FROM range(1, 31)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE day IN (5, 6) AND region IN (105, 106)")
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("day", "region"))
    val snap = t.snapshot(t.latestVersion())
    assert(snap.deletes.nonEmpty && snap.drows.sum == 2L, s"got ${snap.drows}")
    assert(snap.dmins.exists(_ != Long.MinValue) &&
      snap.dmaxs.exists(_ != Long.MaxValue),
      s"SQL composite delete must record z-bands: ${snap.dmins}/${snap.dmaxs}")
    assert(spark.table(s"$cat.db.t").count() == 28L)
  }

  test("COMPOSITE key: compactDeletes folds z-bands; disjoint files stay servable") {
    val t = new SnapshotTable(spark, freshRoot("zfold"),
      statsCols = Seq("day", "region"))
    Seq((1L, 100L), (11L, 200L), (21L, 300L)).foreach { case (lo, r0) =>
      t.commitAppend(spark.range(lo, lo + 10).toDF("day")
        .withColumn("region", col("day") - lo + r0)
        .withColumn("v", col("day") * 10L).repartition(1))
    }
    t.commitDeleteByKey(Seq((25L, 304L)).toDF("day", "region"),
      Seq("day", "region"))
    t.commitDeleteByKey(Seq((27L, 306L), (25L, 304L)).toDF("day", "region"),
      Seq("day", "region"))
    t.compactDeletes()
    val snap = t.snapshot(t.latestVersion())
    assert(snap.action == "compact_deletes" && snap.deletes.length == 1)
    assert(snap.drows == Seq(2L), s"got ${snap.drows}")
    assert(snap.dmins.head != Long.MinValue,
      s"the folded composite band must stay a z-band: ${snap.dmins}")
    val (n1, scanned1) = t.countRangeDetailed("day", 1L, 10L, -1L)
    assert(n1 == 10L && scanned1.isEmpty, s"got $n1 / $scanned1")
    assert(t.checkTable().rowsBounds.contains((28L, 30L)))
  }

  test("drows survive appends and re-inserts; bounds stay valid (not tight)") {
    val t = new SnapshotTable(spark, freshRoot("carry"), statsCols = Seq("day"))
    threeFiles(t)
    t.commitDeleteByKey(Seq(25L).toDF("day"), Seq("day"))
    // re-insert the deleted key: newer sequence, the delete skips it
    t.commitAppend(Seq((25L, 999L)).toDF("day", "v").repartition(1))
    val snap = t.snapshot(t.latestVersion())
    assert(snap.drows == Seq(1L) && snap.dmins == Seq(25L))
    assert(t.read().count() == 30L)
    // rows (30) ∈ [Σfrows − Σdrows, Σfrows] = [31 − 1, 31]
    val r = t.checkTable()
    assert(r.rowsBounds.contains((30L, 31L)) && r.ok, s"got $r")
  }
}
