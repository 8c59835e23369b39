package graft

/** MERGE `WHEN NOT MATCHED BY SOURCE` on snapshot tables — the full
  * three-way merge surface (ANSI/Spark 3.4+ clause set) through the
  * DSv2 row-level rewrite, in BOTH write modes:
  *
  *  - copy-on-write: the group-based rewrite replaces affected files;
  *  - merge-on-read: the delta rewrite commits equality deletes + fresh
  *    rows as one `merge_mor` version — NO data file rewritten, which
  *    the spec pins by file identity (the 100 TB path: a dimension sync
  *    that deletes stale target rows costs O(delta), not O(table)).
  *
  * The engine-side clause planning is Spark's own (the connector's job
  * is the writers it already has); these tests pin that the snapshot
  * format's writers compose with all clause types, including
  * conditional NOT MATCHED BY SOURCE. */
class MergeBySourceSpec extends SparkSpec {
  import spark.implicits._

  test("copy-on-write: all five clause shapes, conditional BY SOURCE") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mbs_cow").toString
    spark.conf.set("spark.sql.catalog.gmbs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmbs.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gmbs.db")
      spark.sql("CREATE TABLE gmbs.db.t (k BIGINT, v BIGINT) USING `graft-snapshot`")
      spark.sql("INSERT INTO gmbs.db.t VALUES (1, 10), (2, 20), (3, 30)")
      Seq((2L, 200L), (4L, 400L)).toDF("k", "v").createOrReplaceTempView("src_mbs")
      spark.sql("""
        MERGE INTO gmbs.db.t t USING src_mbs s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = v + 1""")
      assert(spark.table("gmbs.db.t").as[(Long, Long)].collect().toSet ==
        Set((1L, 11L), (2L, 200L), (4L, 400L)))
      // pre-merge version stays readable (ordinary versioned commit)
      val t = new graft.sources.SnapshotTable(spark, s"$wh/db/t")
      assert(t.read(2L).count() == 3L)
    } finally spark.conf.unset("spark.sql.catalog.gmbs")
  }

  test("merge-on-read: BY SOURCE deletes ride equality deltas, files kept") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mbs_mor").toString
    spark.conf.set("spark.sql.catalog.gmbs2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmbs2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gmbs2.db")
      spark.sql("CREATE TABLE gmbs2.db.t (k BIGINT, v BIGINT) USING `graft-snapshot` " +
        "TBLPROPERTIES('write.merge.mode'='merge-on-read','write.delete.key'='k')")
      spark.sql("INSERT INTO gmbs2.db.t VALUES (1, 10), (2, 20), (3, 30)")
      val t = new graft.sources.SnapshotTable(spark, s"$wh/db/t")
      val preFiles = t.snapshot(t.latestVersion()).files.toSet
      Seq((2L, 200L), (4L, 400L)).toDF("k", "v").createOrReplaceTempView("src_mbs2")
      spark.sql("""
        MERGE INTO gmbs2.db.t t USING src_mbs2 s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      assert(spark.table("gmbs2.db.t").as[(Long, Long)].collect().toSet ==
        Set((2L, 200L), (4L, 400L)))
      val tip = t.latestVersion()
      val snap = t.snapshot(tip)
      assert(snap.action == "merge_mor")
      // no data file rewritten: every pre-merge file still listed
      assert(preFiles.subsetOf(snap.files.toSet))
      assert(snap.deletes.nonEmpty)
      // the change feed retracts the BY-SOURCE delete and the update's
      // pre-image, inserts the new/updated rows
      val cdf = t.readChangeFeed(tip - 1, tip)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
      assert(cdf == Set((1L, "delete"), (2L, "delete"), (3L, "delete"),
        (2L, "insert"), (4L, "insert")))
    } finally spark.conf.unset("spark.sql.catalog.gmbs2")
  }
}
