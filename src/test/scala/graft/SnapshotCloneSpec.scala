package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Zero-copy table clone on the snapshot format — the public formats'
  * shallow clone (Delta `CREATE TABLE ... SHALLOW CLONE`), plus a deep
  * variant. The shallow clone's first manifest lists the source's files
  * by ABSOLUTE path, so a clone is one manifest write at any table size;
  * a `clone-v<N>` tag on the source pins the shared files against source
  * retention (the coupling Delta documents as a caveat is closed
  * structurally here). */
class SnapshotCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_clone_$tag")
    f.toFile.delete()
    f.toString
  }

  private def ids(t: SnapshotTable, version: Long = -1L): Set[Long] =
    t.read(version).select("id").as[Long].collect().toSet

  test("shallow clone: same content, absolute entries, fully divergent") {
    val src = new SnapshotTable(spark, freshRoot("shal_src"))
    src.commitAppend(Seq(1L, 2L).toDF("id"))
    src.commitAppend(Seq(3L, 4L).toDF("id"))
    val dstRoot = freshRoot("shal_dst")
    val v = src.cloneTo(dstRoot)
    assert(v == 2L)
    val dst = new SnapshotTable(spark, dstRoot)
    assert(dst.latestVersion() == 2L)
    assert(ids(dst) == Set(1L, 2L, 3L, 4L))
    // zero-copy: every carried entry is absolute (resolves outside the
    // clone's own data dir), and the clone's data dir holds nothing yet
    val snap = dst.snapshot(2L)
    assert(snap.action == "clone" && snap.dataChange)
    assert(snap.files.nonEmpty && snap.files.forall(f =>
      new org.apache.hadoop.fs.Path(f).isAbsolute))
    assert(!new java.io.File(dstRoot, "data").exists())
    // divergence is independent in both directions
    src.commitAppend(Seq(5L).toDF("id"))
    dst.commitAppend(Seq(6L).toDF("id"))
    assert(ids(src) == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(dst) == Set(1L, 2L, 3L, 4L, 6L))
    // the clone's own commits are ordinary relative files in ITS dir
    val tip = dst.snapshot(dst.latestVersion())
    assert(tip.files.exists(f => !new org.apache.hadoop.fs.Path(f).isAbsolute))
  }

  test("clone at an older version is time-travel clone") {
    val src = new SnapshotTable(spark, freshRoot("tt_src"))
    src.commitAppend(Seq(1L).toDF("id"))
    src.commitOverwrite(Seq(2L, 3L).toDF("id"))
    val dstRoot = freshRoot("tt_dst")
    assert(src.cloneTo(dstRoot, version = 1L) == 1L)
    assert(ids(new SnapshotTable(spark, dstRoot)) == Set(1L))
  }

  test("the clone pin tag survives source vacuum; dropping it releases") {
    val srcRoot = freshRoot("pin_src")
    val src = new SnapshotTable(spark, srcRoot)
    src.commitAppend(Seq(1L).toDF("id"))
    val dstRoot = freshRoot("pin_dst")
    src.cloneTo(dstRoot) // pins clone-v1 on the source
    assert(src.tags().get("clone-v1").contains(1L))
    // source rewrites + vacuums aggressively: the cloned version's files
    // are pinned by the tag, so the clone keeps reading
    src.commitOverwrite(Seq(2L).toDF("id"))
    src.vacuum(keepLast = 1)
    assert(ids(new SnapshotTable(spark, dstRoot)) == Set(1L))
    // dropping the tag is the explicit release — source vacuum may now
    // reclaim the shared files and the clone's carried read breaks
    src.dropTag("clone-v1")
    src.vacuum(keepLast = 1)
    intercept[Exception] {
      new SnapshotTable(spark, dstRoot).read().collect()
    }
  }

  test("a second clone of the same version reuses the pin tag") {
    val src = new SnapshotTable(spark, freshRoot("pin2_src"))
    src.commitAppend(Seq(1L).toDF("id"))
    src.cloneTo(freshRoot("pin2_a"))
    src.cloneTo(freshRoot("pin2_b")) // must not trip create-exclusive
    assert(src.tags() == Map("clone-v1" -> 1L))
  }

  test("the clone's vacuum never reaches the source's files") {
    val src = new SnapshotTable(spark, freshRoot("vac_src"))
    src.commitAppend(Seq(1L, 2L).toDF("id"))
    val dstRoot = freshRoot("vac_dst")
    src.cloneTo(dstRoot)
    val dst = new SnapshotTable(spark, dstRoot)
    // clone rewrites itself, then vacuums: only ITS data dir is swept
    dst.commitOverwrite(Seq(9L).toDF("id"))
    dst.vacuum(keepLast = 1)
    assert(ids(dst) == Set(9L))
    assert(ids(src) == Set(1L, 2L)) // source untouched
  }

  test("deep clone copies files: relative entries, no coupling, no tag") {
    val srcRoot = freshRoot("deep_src")
    val src = new SnapshotTable(spark, srcRoot)
    src.commitAppend(Seq(1L, 2L).toDF("id"))
    val dstRoot = freshRoot("deep_dst")
    src.cloneTo(dstRoot, deep = true)
    assert(src.tags().isEmpty) // no pin needed
    val dst = new SnapshotTable(spark, dstRoot)
    assert(dst.snapshot(1L).files.forall(f =>
      !new org.apache.hadoop.fs.Path(f).isAbsolute))
    // source retention cannot touch it — even deleting the source whole
    src.commitOverwrite(Seq(3L).toDF("id"))
    src.vacuum(keepLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(srcRoot), true)
    assert(ids(dst) == Set(1L, 2L))
  }

  test("merge-on-read deletes, properties, and stats bands carry") {
    val src = new SnapshotTable(spark, freshRoot("mor_src"),
      statsCols = Seq("id"))
    src.setTableProperties(Map("write.delete.key" -> "id"))
    src.commitAppend((1L to 10L).toDF("id"))
    src.commitDeleteByKey(Seq(3L, 7L).toDF("id"), Seq("id"))
    val dstRoot = freshRoot("mor_dst")
    val v = src.cloneTo(dstRoot)
    val dst = new SnapshotTable(spark, dstRoot,
      statsCols = Seq("id"))
    // carried equality deletes apply through the clone's read
    assert(ids(dst) == (1L to 10L).toSet -- Set(3L, 7L))
    // the properties sidecar copied: the clone continues MOR DML
    assert(dst.tableProperties.get("write.delete.key").contains("id"))
    dst.commitDeleteByKey(Seq(1L).toDF("id"), Seq("id"))
    assert(ids(dst) == (2L to 10L).toSet -- Set(3L, 7L))
    assert(ids(src) == (1L to 10L).toSet -- Set(3L, 7L)) // source unmoved
    // stats bands carried verbatim: a range read on the clone prunes to
    // the carried band yet stays exact
    assert(dst.readRange("id", 2L, 4L, -1L).select("id").as[Long].collect().toSet
      == Set(2L, 4L))
    // manifest statsCols recorded, so a catalog probe reopens with them
    assert(dst.snapshot(v).statsCols == Seq("id"))
  }

  test("column-mapped source clones with its mapping intact") {
    val src = new SnapshotTable(spark, freshRoot("map_src"))
    src.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    src.commitRenameColumn("name", "label")
    val dstRoot = freshRoot("map_dst")
    src.cloneTo(dstRoot)
    val dst = new SnapshotTable(spark, dstRoot)
    assert(dst.read().columns.toSeq == Seq("id", "label"))
    assert(dst.read().select("label").as[String].collect().toSet == Set("a", "b"))
  }

  test("change feed over the clone version is a full insert") {
    val src = new SnapshotTable(spark, freshRoot("cdf_src"))
    src.commitAppend(Seq(1L, 2L).toDF("id"))
    val dstRoot = freshRoot("cdf_dst")
    src.cloneTo(dstRoot)
    val dst = new SnapshotTable(spark, dstRoot)
    dst.commitDelete(col("id") === 1L)
    val cdf = dst.readChangeFeed(0L, 2L)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(cdf == Set((1L, "insert", 1L), (2L, "insert", 1L),
      (1L, "delete", 2L)))
  }

  test("clone of a shallow clone re-points at the ORIGINAL files") {
    val src = new SnapshotTable(spark, freshRoot("chain_src"))
    src.commitAppend(Seq(1L).toDF("id"))
    val midRoot = freshRoot("chain_mid")
    src.cloneTo(midRoot)
    val endRoot = freshRoot("chain_end")
    new SnapshotTable(spark, midRoot).cloneTo(endRoot)
    val end = new SnapshotTable(spark, endRoot)
    assert(ids(end) == Set(1L))
    // deleting the MIDDLE table does not break the end of the chain
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(midRoot), true)
    assert(ids(new SnapshotTable(spark, endRoot)) == Set(1L))
    // and a DEEP clone of a shallow clone recovers uuid/name layout
    val deepRoot = freshRoot("chain_deep")
    new SnapshotTable(spark, endRoot).cloneTo(deepRoot, deep = true)
    val deep = new SnapshotTable(spark, deepRoot)
    assert(deep.snapshot(1L).files.forall(f =>
      !new org.apache.hadoop.fs.Path(f).isAbsolute &&
        f.split('/').length == 2))
    assert(ids(deep) == Set(1L))
  }

  test("destination that is already a table is refused") {
    val src = new SnapshotTable(spark, freshRoot("dup_src"))
    src.commitAppend(Seq(1L).toDF("id"))
    val dstRoot = freshRoot("dup_dst")
    src.cloneTo(dstRoot)
    intercept[Exception](src.cloneTo(dstRoot))
    intercept[Exception](src.cloneTo(freshRoot("dup_empty_src_probe"), 99L))
  }

  test("CALL clone: the SQL surface, shallow and deep, bad dest loud") {
    val wh = freshRoot("call_wh")
    spark.conf.set("spark.sql.catalog.gclsp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclsp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gclsp.db")
      spark.sql("CREATE TABLE gclsp.db.src (id BIGINT) USING `graft-snapshot`")
      spark.sql("INSERT INTO gclsp.db.src VALUES (1), (2)")
      spark.sql("INSERT INTO gclsp.db.src VALUES (3)")
      val out = spark.sql(
        "CALL gclsp.system.clone('db.src', 'db.dst')").collect().head
      assert(out.getLong(0) == 3L && out.getString(2) == "shallow")
      assert(spark.table("gclsp.db.dst").select("id").as[Long].collect().toSet
        == Set(1L, 2L, 3L))
      // version + deep arguments; the clone is a first-class table
      spark.sql("CALL gclsp.system.clone('db.src', 'db.dst2', 2, true)")
      assert(spark.table("gclsp.db.dst2").select("id").as[Long].collect().toSet
        == Set(1L, 2L))
      spark.sql("INSERT INTO gclsp.db.dst2 VALUES (9)")
      assert(spark.table("gclsp.db.dst2").count() == 3L)
      assert(spark.table("gclsp.db.src").count() == 3L)
      // loud failures: existing dest, missing namespace, missing source
      intercept[Exception](
        spark.sql("CALL gclsp.system.clone('db.src', 'db.dst')"))
      intercept[Exception](
        spark.sql("CALL gclsp.system.clone('db.src', 'nope.dst')"))
      intercept[Exception](
        spark.sql("CALL gclsp.system.clone('db.missing', 'db.dst3')"))
    } finally spark.conf.unset("spark.sql.catalog.gclsp")
  }
}
