package graft

import org.apache.spark.sql.functions._
import graft.sources.{MaintainPolicy, SnapshotTable}

/** The unified maintenance entrypoint: `maintain()` reads the
  * manifest's debris metrics (delete-file census + foldability,
  * small-file bytes, band-overlap depth, retained versions) and runs
  * ONE cheapest-applicable step — the call an operator's cron loops
  * until `none`. Each step must strictly reduce its own metric and
  * leave the table contents untouched. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_maint_$tag")
    f.toFile.delete()
    f.toString
  }

  private def contents(t: SnapshotTable): (Long, Long) = {
    val r = t.read().agg(count(lit(1)), coalesce(sum(col("v")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("delete debris: one fold, then clean") {
    val t = new SnapshotTable(spark, freshRoot("del"), statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartition(1))
    t.commitDeleteByKey(Seq(5L).toDF("k"), Seq("k"))
    t.commitDeleteByKey(Seq(7L).toDF("k"), Seq("k"))
    val before = contents(t)
    val p = MaintainPolicy(deleteFilesAt = 2, smallFileBytes = 1L)
    val r1 = t.maintain(p)
    assert(r1.action == "compact_deletes", s"got $r1")
    assert(t.snapshot(t.latestVersion()).deletes.length == 1)
    assert(t.maintain(p).action == "none")
    assert(contents(t) == before)
  }

  test("small-file debris: one fold, then clean") {
    val t = new SnapshotTable(spark, freshRoot("small"), statsCols = Seq("k"))
    (0 until 4).foreach(i => t.commitAppend(
      spark.range(i * 100L, i * 100L + 100L).select(col("id").as("k"),
        (col("id") * 3).as("v")).repartition(1)))
    val before = contents(t)
    val p = MaintainPolicy(smallFilesAt = 3, smallFileBytes = 1L * 1024 * 1024,
      overlapAt = 99)
    val r1 = t.maintain(p)
    assert(r1.action == "compact_files" && r1.estBytes > 0L, s"got $r1")
    assert(t.snapshot(t.latestVersion()).files.length < 4)
    assert(t.maintain(p).action == "none")
    assert(contents(t) == before)
  }

  test("band-overlap debris: the deepest clique folds, then clean") {
    val t = new SnapshotTable(spark, freshRoot("ovl"), statsCols = Seq("k"))
    // 4 files ALL covering [0,1000) — depth 4 at any stab point — plus
    // one disjoint cold file that must survive by identity
    (0 until 4).foreach(_ => t.commitAppend(
      spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 3).as("v")).repartition(1)))
    t.commitAppend(spark.range(50000, 51000).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartition(1))
    val cold = t.snapshot(t.latestVersion()).files.last
    val before = contents(t)
    val p = MaintainPolicy(overlapAt = 3, smallFileBytes = 1L)
    val r1 = t.maintain(p)
    assert(r1.action == "compact_range", s"got $r1")
    val snap = t.snapshot(t.latestVersion())
    assert(snap.files.contains(cold), "the disjoint cold file survives by identity")
    assert(snap.files.length < 5)
    assert(t.maintain(p).action == "none")
    assert(contents(t) == before)
  }

  test("mixed debris drains cheapest-first: deletes, then files, then none") {
    val t = new SnapshotTable(spark, freshRoot("mixed"), statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 10000).select(col("id").as("k"),
      (col("id") * 3).as("v")).repartition(1))
    (0 until 4).foreach(i => t.commitAppend(
      spark.range(20000L + i * 100, 20000L + i * 100 + 100)
        .select(col("id").as("k"), (col("id") * 3).as("v")).repartition(1)))
    t.commitDeleteByKey(Seq(5L).toDF("k"), Seq("k"))
    t.commitDeleteByKey(Seq(7L).toDF("k"), Seq("k"))
    val before = contents(t)
    val p = MaintainPolicy(deleteFilesAt = 2, smallFilesAt = 3,
      smallFileBytes = 1L * 1024 * 1024, overlapAt = 99)
    val steps = Iterator.continually(t.maintain(p))
      .takeWhile(_.action != "none").toVector
    assert(steps.map(_.action) == Vector("compact_deletes", "compact_files"),
      s"got ${steps.map(r => (r.action, r.estBytes))}")
    // cheapest first: the delete fold's estimated bytes were smaller
    assert(steps(0).estBytes < steps(1).estBytes, s"got $steps")
    assert(contents(t) == before)
    assert(t.maintain(p).action == "none")
  }

  test("retention vacuum runs only when nothing needs rewriting") {
    val t = new SnapshotTable(spark, freshRoot("vac"), statsCols = Seq("k"))
    (0 until 6).foreach(i => t.commitAppend(
      spark.range(i * 1000L, i * 1000L + 1000L).select(col("id").as("k"),
        (col("id") * 3).as("v")).repartition(1)))
    val p = MaintainPolicy(smallFileBytes = 1L, overlapAt = 99, maxRetained = 3)
    val r = t.maintain(p)
    assert(r.action == "vacuum", s"got $r")
    assert(t.history().length <= 3)
    assert(t.maintain(p).action == "none")
  }

  test("CALL maintain drives a debris table to clean through SQL") {
    val wh = freshRoot("call")
    val cat = "gmnt"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='k')")
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.t SELECT id AS k, id * 3 AS v " +
        s"FROM range(${i * 100}, ${i * 100 + 100})"))
    val want = spark.table(s"$cat.db.t").as[(Long, Long)].collect().toSet
    var actions = Vector.empty[String]
    var guard = 0
    var done = false
    while (!done && guard < 10) {
      val a = spark.sql(s"CALL $cat.system.maintain('db.t')")
        .select("action").as[String].head()
      if (a == "none") done = true else actions :+= a
      guard += 1
    }
    assert(done && actions.nonEmpty, s"never drained: $actions")
    assert(spark.table(s"$cat.db.t").as[(Long, Long)].collect().toSet == want)
  }
}
