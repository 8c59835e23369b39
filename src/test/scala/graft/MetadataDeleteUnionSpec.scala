package graft

import org.apache.spark.sql.functions._
import graft.sources.{SnapshotBatch, SnapshotTable}

/** Metadata-only DELETE over DISJUNCTIVE predicates: a single-column OR
  * (or exact-key IN) whose truth set is a union of contiguous exact
  * bands serves as a manifest re-list — the multi-range retention drop
  * (`DELETE WHERE day < keep_lo OR day >= probe_hi`) rewrites nothing.
  * Pinned: file identity across the statement, straddlers and
  * cross-column ORs declining to the (still correct) row-level path,
  * NULL-carrying files never metadata-dropped under a null-rejecting
  * predicate, and the interval coalesce/intersect algebra. */
class MetadataDeleteUnionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_mdu_$tag")
    f.toFile.delete()
    f.toString
  }

  private var n = 0
  /** A catalog-backed day-clustered table: one file per insert. */
  private def monthly(rows: Seq[String]*): (String, SnapshotTable) = {
    n += 1
    val cat = s"gmdu$n"
    val wh = freshRoot(cat)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.daily (day DATE, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='day')")
    rows.zipWithIndex.foreach { case (days, i) =>
      spark.sql(s"INSERT INTO $cat.db.daily VALUES " +
        days.zipWithIndex.map { case (d, j) =>
          s"(DATE'$d', ${i * 10 + j})" }.mkString(", "))
    }
    (s"$cat.db.daily", new SnapshotTable(spark, s"$wh/db/daily", Seq("day")))
  }

  test("OR of two ranges drops the edge files by identity, keeps the middle") {
    val (tbl, t) = monthly(
      Seq("2026-01-05", "2026-01-20"),
      Seq("2026-02-05", "2026-02-20"),
      Seq("2026-03-05", "2026-03-20"))
    val before = t.snapshot(t.latestVersion())
    spark.sql(s"DELETE FROM $tbl WHERE day < DATE'2026-02-01' " +
      "OR day >= DATE'2026-03-01'")
    val after = t.snapshot(t.latestVersion())
    assert(after.action == "delete" && after.rows == 2L)
    assert(after.files.forall(before.files.contains),
      "multi-range metadata delete must not write any file")
    // drops exactly the two edge files (the CREATE's empty
    // schema-bearing file classifies outside and stays)
    assert(after.files.length == before.files.length - 2)
    assert(spark.table(tbl).select("v").as[Long].collect().toSet ==
      Set(10L, 11L))
  }

  test("IN over exact keys drops fully-covered files; straddlers fall back correctly") {
    // single-day files: each file's band is one point
    val (tbl, t) = monthly(
      Seq("2026-01-05", "2026-01-05"),
      Seq("2026-02-05", "2026-02-05"),
      Seq("2026-03-05", "2026-03-05"))
    val before = t.snapshot(t.latestVersion())
    spark.sql(s"DELETE FROM $tbl WHERE day IN (DATE'2026-01-05', DATE'2026-03-05')")
    val after = t.snapshot(t.latestVersion())
    assert(after.files.forall(before.files.contains) &&
      after.files.length == before.files.length - 2,
      "exact-key IN over single-day files must be a manifest edit")
    assert(spark.table(tbl).select("v").as[Long].collect().toSet ==
      Set(10L, 11L))
    // a straddling IN (file holds both a listed and an unlisted day)
    // declines to the row-level path but stays correct
    val (tbl2, t2) = monthly(Seq("2026-01-05", "2026-01-20"),
      Seq("2026-02-05", "2026-02-20"))
    spark.sql(s"DELETE FROM $tbl2 WHERE day IN (DATE'2026-01-05')")
    assert(spark.table(tbl2).select("v").as[Long].collect().toSet ==
      Set(1L, 10L, 11L))
    assert(t2.read().count() == 3L)
  }

  test("a gap-straddling file declines; cross-column OR declines; both stay correct") {
    val (tbl, _) = monthly(
      Seq("2026-01-05", "2026-01-20"), // straddles [*, Jan10] ∪ [Jan15, *]? no — gap (Jan10, Jan15)
      Seq("2026-02-05", "2026-02-20"))
    // file 1 spans the gap between the two ranges: not provably inside,
    // not outside — the statement takes the row-level path and both its
    // matching rows are still deleted
    spark.sql(s"DELETE FROM $tbl WHERE day <= DATE'2026-01-10' " +
      "OR (day >= DATE'2026-01-15' AND day <= DATE'2026-01-31')")
    assert(spark.table(tbl).select("v").as[Long].collect().toSet ==
      Set(10L, 11L))
    // OR across different columns has no single-column union: declines
    val (tbl2, _) = monthly(Seq("2026-01-05"), Seq("2026-02-05"))
    spark.sql(s"DELETE FROM $tbl2 WHERE day < DATE'2026-02-01' OR v = 999")
    assert(spark.table(tbl2).select("v").as[Long].collect().toSet == Set(10L))
  }

  test("NULL-carrying files never metadata-drop under a null-rejecting OR") {
    val cat = "gmdunull"
    val wh = freshRoot(cat)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.daily (day DATE, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='day')")
    spark.sql(s"INSERT INTO $cat.db.daily VALUES (DATE'2026-01-05', 1), (NULL, 2)")
    spark.sql(s"INSERT INTO $cat.db.daily VALUES (DATE'2026-02-05', 3)")
    spark.sql(s"DELETE FROM $cat.db.daily WHERE day < DATE'2026-01-10' " +
      "OR day >= DATE'2026-03-01'")
    // the NULL row does not match the predicate and must survive
    assert(spark.table(s"$cat.db.daily").select("v").as[Long].collect().toSet ==
      Set(2L, 3L))
  }

  test("interval algebra: coalesce merges overlap and exact-key adjacency; intersect clips") {
    assert(SnapshotBatch.coalesceRanges(Seq((5L, 9L), (1L, 4L))) ==
      Seq((1L, 9L)), "adjacent exact keys merge")
    assert(SnapshotBatch.coalesceRanges(Seq((1L, 4L), (6L, 9L))) ==
      Seq((1L, 4L), (6L, 9L)), "a gap stays a gap")
    assert(SnapshotBatch.coalesceRanges(Seq((1L, 7L), (3L, 5L), (6L, 9L))) ==
      Seq((1L, 9L)))
    assert(SnapshotBatch.coalesceRanges(
      Seq((Long.MaxValue, Long.MaxValue), (0L, 1L))) ==
      Seq((0L, 1L), (Long.MaxValue, Long.MaxValue)),
      "MaxValue adjacency must not overflow")
    assert(SnapshotBatch.intersectRanges(
      Seq((1L, 10L), (20L, 30L)), Seq((5L, 25L))) ==
      Seq((5L, 10L), (20L, 25L)))
    assert(SnapshotBatch.intersectRanges(Seq((1L, 2L)), Seq((3L, 4L))).isEmpty)
  }
}
