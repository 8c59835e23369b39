package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Named refs on the snapshot format — tags (immutable version pins that
  * survive retention) and branches (separate manifest chains over shared
  * data files) with fast-forward publish: the write-audit-publish
  * pattern. Public-format shape: Iceberg refs, re-expressed on the
  * linear manifest chain. */
class SnapshotRefsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_refs_$tag")
    f.toFile.delete()
    f.toString
  }

  private def ids(t: SnapshotTable, version: Long = -1L): Set[Long] =
    t.read(version).select("id").as[Long].collect().toSet

  test("tags: create, resolve, list, drop; immutable; dangling refused") {
    val t = new SnapshotTable(spark, freshRoot("tags"))
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitAppend(Seq(3L).toDF("id"))
    t.createTag("rel-1", 1L)
    t.createTag("rel_2", 2L)
    assert(t.tagVersion("rel-1") == 1L)
    assert(t.tags() == Map("rel-1" -> 1L, "rel_2" -> 2L))
    assert(t.readTag("rel-1").select("id").as[Long].collect().toSet == Set(1L, 2L))
    // tags never move: a second create of the same name is loud
    intercept[Exception](t.createTag("rel-1", 2L))
    // a tag at a version that does not exist pins nothing — refused
    intercept[Exception](t.createTag("future", 99L))
    intercept[Exception](t.createTag("bad/name", 1L))
    t.dropTag("rel-1")
    assert(t.tags() == Map("rel_2" -> 2L))
    intercept[Exception](t.tagVersion("rel-1"))
  }

  test("a tag PINS its version through vacuum; dropping the tag releases it") {
    val root = freshRoot("pin")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    t.commitOverwrite(Seq(2L).toDF("id"))
    t.commitOverwrite(Seq(3L).toDF("id"))
    t.createTag("keeper", 1L)
    t.vacuum(keepLast = 1)
    // the tagged version (and everything after it) survived retention
    assert(ids(new SnapshotTable(spark, root), 1L) == Set(1L))
    assert(ids(new SnapshotTable(spark, root), 2L) == Set(2L))
    t.dropTag("keeper")
    t.vacuum(keepLast = 1)
    // released: a FRESH handle (no manifest memo) can no longer read v1
    intercept[Exception](ids(new SnapshotTable(spark, root), 1L))
    assert(ids(new SnapshotTable(spark, root)) == Set(3L))
  }

  test("branch: staged commits are invisible on main; branch reads see both sides") {
    val root = freshRoot("iso")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    val fork = t.createBranch("wap")
    assert(fork == 1L && t.branches() == Seq("wap") && t.forkVersion("wap") == 1L)
    val b = t.branch("wap")
    b.commitAppend(Seq(10L, 11L).toDF("id"))
    assert(ids(b) == Set(1L, 2L, 10L, 11L), "branch sees fork + staged")
    assert(ids(t) == Set(1L, 2L), "main never sees staged commits")
    // path-based read with option(branch)
    val viaOption = spark.read.format("graft-snapshot")
      .option("branch", "wap").load(root)
    assert(viaOption.select("id").as[Long].collect().toSet == Set(1L, 2L, 10L, 11L))
    intercept[Exception](t.branch("nope"))
    intercept[Exception](t.createBranch("wap")) // exists: loud
  }

  test("fastForward publishes the branch tip onto main WITHOUT rewriting data") {
    val root = freshRoot("ff")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.createBranch("wap")
    val b = t.branch("wap")
    b.commitAppend(Seq(10L).toDF("id"))
    b.commitAppend(Seq(11L).toDF("id"))
    val bFiles = b.snapshot(b.latestVersion()).files.toSet

    val v = t.fastForward("wap")
    assert(v == 2L)
    assert(ids(t) == Set(1L, 2L, 10L, 11L))
    val main = t.snapshot(v)
    assert(main.action == "fastforward")
    assert(main.files.toSet == bFiles,
      "fast-forward re-lists the branch's files — zero data rewrite")
    // audited history stays walkable on main
    assert(t.history().map(_.action) == Seq("append", "fastforward"))
    // appends continue normally after the fast-forward
    t.commitAppend(Seq(20L).toDF("id"))
    assert(ids(t) == Set(1L, 2L, 10L, 11L, 20L))
  }

  test("fastForward fails cleanly when main advanced past the fork") {
    val t = new SnapshotTable(spark, freshRoot("conflict"))
    t.commitAppend(Seq(1L).toDF("id"))
    t.createBranch("stale")
    t.branch("stale").commitAppend(Seq(10L).toDF("id"))
    t.commitAppend(Seq(2L).toDF("id")) // main moves first
    val e = intercept[Exception](t.fastForward("stale"))
    assert(e.getMessage.contains("advanced") || e.getMessage.contains("stale"))
    assert(ids(t) == Set(1L, 2L), "failed publish leaves main intact")
    assert(ids(t.branch("stale")) == Set(1L, 10L), "and the branch intact")
  }

  test("fastForward refuses post-fork merge-on-read deletes; compact clears the path") {
    val t = new SnapshotTable(spark, freshRoot("mor"))
    t.commitAppend(Seq(1L, 2L, 3L).toDF("id"))
    t.createBranch("wap")
    val b = t.branch("wap")
    b.commitAppend(Seq(10L).toDF("id"))
    b.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    assert(ids(b) == Set(1L, 3L, 10L))
    val e = intercept[Exception](t.fastForward("wap"))
    assert(e.getMessage.contains("compact"),
      s"post-fork delete files must refuse with guidance, got: ${e.getMessage}")
    // folding the deletes into data makes the branch fast-forwardable
    b.compact(targetRowsPerFile = 1000000L)
    val v = t.fastForward("wap")
    assert(ids(t, v) == Set(1L, 3L, 10L))
    // post-FF MOR delete on MAIN applies to the carried branch files
    t.commitDeleteByKey(Seq(10L).toDF("id"), Seq("id"))
    assert(ids(t) == Set(1L, 3L))
  }

  test("merge publishes a DIVERGED append-only branch onto the moved main") {
    val t = new SnapshotTable(spark, freshRoot("merge"))
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.createBranch("wap")
    val b = t.branch("wap")
    b.commitAppend(Seq(10L).toDF("id"))
    t.commitAppend(Seq(3L).toDF("id")) // main moves: fastForward refuses
    b.commitAppend(Seq(11L).toDF("id"))
    t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id")) // main even deletes
    intercept[Exception](t.fastForward("wap"))
    val v = t.merge("wap")
    assert(t.snapshot(v).action == "merge")
    // union of both sides' post-fork work, main's MOR delete intact
    assert(ids(t, v) == Set(1L, 3L, 10L, 11L))
    // merge re-LISTED the branch's files — zero data rewrite
    val bNew = b.snapshot(b.latestVersion()).files.toSet --
      t.snapshot(t.forkVersion("wap")).files.toSet
    assert(bNew.subsetOf(t.snapshot(v).files.toSet))
    // merged files outsequence main's delete: a re-merged key survives
    assert(t.snapshot(v).rows == 4L)
    // branch stays intact for audit; drop releases it
    assert(ids(b) == Set(1L, 2L, 10L, 11L))
    t.dropBranch("wap")
  }

  test("merge refuses a branch that rewrote or MOR-deleted since the fork") {
    val t = new SnapshotTable(spark, freshRoot("mergeconflict"))
    t.commitAppend(Seq(1L, 2L, 3L).toDF("id"))
    t.createBranch("rw")
    val b = t.branch("rw")
    b.commitAppend(Seq(10L).toDF("id"))
    b.compact(targetRowsPerFile = 1000000L) // branch rewrote files
    t.commitAppend(Seq(4L).toDF("id"))      // main diverged too
    val e = intercept[Exception](t.merge("rw"))
    assert(e.getMessage.contains("rewrote"),
      s"a rewriting branch must refuse with guidance, got: ${e.getMessage}")
    assert(ids(t) == Set(1L, 2L, 3L, 4L), "failed merge leaves main intact")

    // post-fork MOR delete on the branch refuses the same way
    val t2 = new SnapshotTable(spark, freshRoot("mergemor"))
    t2.commitAppend(Seq(1L, 2L).toDF("id"))
    t2.createBranch("md")
    val b2 = t2.branch("md")
    b2.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    t2.commitAppend(Seq(3L).toDF("id"))
    intercept[Exception](t2.merge("md"))
    assert(ids(t2) == Set(1L, 2L, 3L))
  }

  test("vacuum keeps live-branch files; dropBranch + vacuum reclaims them") {
    val root = freshRoot("reclaim")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    t.createBranch("tmp")
    val b = t.branch("tmp")
    b.commitAppend(Seq(10L).toDF("id"))
    val staged = b.snapshot(b.latestVersion()).files.toSet -- t.snapshot(1L).files.toSet
    assert(staged.nonEmpty)
    def dataFiles(): Set[String] = {
      val dd = new java.io.File(root, "data")
      if (!dd.exists()) Set.empty
      else dd.listFiles().filter(_.isDirectory).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}")).toSet
    }
    t.commitOverwrite(Seq(2L).toDF("id"))
    t.vacuum(keepLast = 1)
    assert(staged.subsetOf(dataFiles()),
      "a live branch's staged files survive main retention")
    assert(ids(t.branch("tmp")) == Set(1L, 10L),
      "…and the branch still reads (its carried fork files survive too)")
    t.dropBranch("tmp")
    // the drop is explicit — no write can be in flight on the dropped
    // chain, so zero grace reclaims its uniquely-referenced files NOW
    // (the default 1h grace protects in-flight publishes; see
    // SnapshotTableSpec's vacuum race test)
    t.vacuum(keepLast = 1, orphanGraceMs = 0L)
    assert(staged.intersect(dataFiles()).isEmpty,
      "a dropped branch's uniquely-referenced files are reclaimed")
    assert(t.branches().isEmpty)
  }

  test("snapshot_refs TVF lists tags and branches with fork versions") {
    val root = freshRoot("refstvf")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    t.commitAppend(Seq(2L).toDF("id"))
    t.createTag("v1-audit", 1L)
    t.createBranch("wip")
    t.branch("wip").commitAppend(Seq(3L).toDF("id"))
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val rows = spark.sql(s"SELECT * FROM snapshot_refs('$root') ORDER BY kind, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(rows == Seq(
      ("branch", "wip", 3L, 2L), // branch tip v3, forked at main v2
      ("tag", "v1-audit", 1L, -1L)))
  }

  test("branch handles refuse table-wide retention; refs refuse branch handles") {
    val t = new SnapshotTable(spark, freshRoot("guards"))
    t.commitAppend(Seq(1L).toDF("id"))
    t.createBranch("b1")
    val b = t.branch("b1")
    intercept[IllegalArgumentException](b.vacuum(1))
    intercept[IllegalArgumentException](b.expireSnapshots(0L))
    intercept[IllegalArgumentException](b.createTag("x", 1L))
    intercept[IllegalArgumentException](b.createBranch("b2"))
    intercept[IllegalArgumentException](b.fastForward("b1"))
  }

  test("refs compose with manifest-list groups: branch + FF on a grouped table") {
    val root = freshRoot("groups")
    // shrunk fold threshold: main's tip manifest references GROUP files
    val t = new SnapshotTable(spark, root, groupInlineFold = 4)
    (0 until 12).foreach(k => t.commitAppend(Seq(k.toLong).toDF("id")))
    assert(t.snapshot(t.latestVersion()).groupRefs.nonEmpty,
      "precondition: the fork point must be group-encoded")
    t.createBranch("wap")
    val b = t.branch("wap")
    (100 until 106).foreach(k => b.commitAppend(Seq(k.toLong).toDF("id")))
    assert(ids(b) == ((0L until 12L) ++ (100L until 106L)).toSet)
    val v = t.fastForward("wap")
    assert(ids(t, v) == ((0L until 12L) ++ (100L until 106L)).toSet)
    // the FF manifest's groups resolve against MAIN's directory (a
    // dropped branch must not dangle them) — prove it by dropping the
    // branch and re-reading main through a FRESH handle
    t.dropBranch("wap")
    val fresh = new SnapshotTable(spark, root, groupInlineFold = 4)
    assert(ids(fresh) == ((0L until 12L) ++ (100L until 106L)).toSet)
    fresh.vacuum(keepLast = 1)
    assert(ids(new SnapshotTable(spark, root, groupInlineFold = 4)) ==
      ((0L until 12L) ++ (100L until 106L)).toSet)
  }

  test("streaming WAP: epochs stage on a branch, fastForward publishes the audit") {
    val dir = freshRoot("streamwap")
    val srcRoot = s"$dir/src"
    val dstRoot = s"$dir/dst"
    val src = new SnapshotTable(spark, srcRoot)
    src.commitAppend(Seq(10L, 11L).toDF("id"))
    src.commitAppend(Seq(12L).toDF("id"))
    val dst = new SnapshotTable(spark, dstRoot)
    dst.commitAppend(Seq(1L).toDF("id"))
    dst.createBranch("ingest")

    val q = spark.readStream.format("graft-snapshot").load(srcRoot)
      .writeStream.format("graft-snapshot")
      .option("path", dstRoot)
      .option("branch", "ingest")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(ids(dst) == Set(1L), "staged epochs never touch main")
    val audited = ids(dst.branch("ingest"))
    assert(audited == Set(1L, 10L, 11L, 12L), "branch = fork + streamed epochs")
    dst.fastForward("ingest")
    assert(ids(dst) == Set(1L, 10L, 11L, 12L))
    // epoch idempotency holds on the branch chain too: a re-drain of the
    // same checkpoint with nothing new stages nothing
    val before = dst.branch("ingest").latestVersion()
    val q2 = spark.readStream.format("graft-snapshot").load(srcRoot)
      .writeStream.format("graft-snapshot")
      .option("path", dstRoot).option("branch", "ingest")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(dst.branch("ingest").latestVersion() == before)
  }

  test("readStream from a branch delivers post-fork appends only") {
    val dir = freshRoot("branchfeed")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    t.createBranch("b")
    val b = t.branch("b")
    b.commitAppend(Seq(10L).toDF("id"))
    b.commitAppend(Seq(11L).toDF("id"))
    t.commitAppend(Seq(2L).toDF("id")) // main-only: not on the branch feed

    val got = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.format("graft-snapshot")
      .option("branch", "b").load(root)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        { got ++= batch.select("id").as[Long].collect(); () })
      .start()
    q.awaitTermination()
    assert(got.toSet == Set(10L, 11L),
      "a branch feed starts at the fork (bootstrap = batch-read the fork) " +
        "and never sees main-only commits")
  }

  test("SQL surface: CALL procedures + VERSION AS OF a tag name") {
    val cat = "graftrefscat"
    val wh = java.nio.file.Files.createTempDirectory("graft_refs_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.rt (id BIGINT) USING `graft-snapshot`")
    spark.sql(s"INSERT INTO $cat.db.rt VALUES (1), (2)")
    spark.sql(s"CALL $cat.system.create_tag('db.rt', 'v-first')")
    spark.sql(s"INSERT INTO $cat.db.rt VALUES (3)")
    // SQL time travel by ref: non-numeric VERSION AS OF resolves the tag
    assert(spark.sql(s"SELECT * FROM $cat.db.rt VERSION AS OF 'v-first'")
      .count() == 2L)
    assert(spark.table(s"$cat.db.rt").count() == 3L)

    val fork = spark.sql(s"CALL $cat.system.create_branch('db.rt', 'wap')")
      .head.getLong(0)
    val root = s"$wh/db/rt"
    val t = new SnapshotTable(spark, root)
    assert(fork == t.latestVersion())
    t.branch("wap").commitAppend(Seq(10L, 11L).toDF("id"))
    assert(spark.table(s"$cat.db.rt").count() == 3L, "staged rows invisible")
    val v = spark.sql(s"CALL $cat.system.fast_forward('db.rt', 'wap')")
      .head.getLong(0)
    assert(v == fork + 1)
    assert(spark.table(s"$cat.db.rt").count() == 5L)
    spark.sql(s"CALL $cat.system.drop_branch('db.rt', 'wap')")
    assert(t.branches().isEmpty)
    spark.sql(s"CALL $cat.system.drop_tag('db.rt', 'v-first')")
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.db.rt VERSION AS OF 'v-first'").count())

    // diverged-branch merge through the SQL surface
    spark.sql(s"CALL $cat.system.create_branch('db.rt', 'late')")
    t.branch("late").commitAppend(Seq(20L).toDF("id"))
    spark.sql(s"INSERT INTO $cat.db.rt VALUES (6)") // main moves: diverged
    val mv = spark.sql(s"CALL $cat.system.merge_branch('db.rt', 'late')")
      .head.getLong(0)
    assert(t.snapshot(mv).action == "merge")
    assert(spark.table(s"$cat.db.rt").count() == 7L)
  }
}
