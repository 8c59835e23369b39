package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Snapshot-versioned table format: manifest-atomic commits, time
  * travel, roll-forward rollback, optimistic-concurrency retry, vacuum
  * reachability. */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapspec_$tag")
    f.toFile.delete() // SnapshotTable builds its own layout
    f.toString
  }

  private def ids(t: SnapshotTable, version: Long = -1L): Set[Long] =
    t.read(version).select("id").as[Long].collect().toSet

  test("append is cumulative, overwrite replaces, old versions stay readable") {
    val t = new SnapshotTable(spark, freshRoot("basic"))
    val v1 = t.commitAppend(Seq(1L, 2L).toDF("id"))
    val v2 = t.commitAppend(Seq(3L).toDF("id"))
    val v3 = t.commitOverwrite(Seq(9L, 10L).toDF("id"))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    // time travel: earlier versions are untouched by later commits
    assert(ids(t, v1) == Set(1L, 2L))
    assert(ids(t, v2) == Set(1L, 2L, 3L))
    assert(ids(t, v3) == Set(9L, 10L))
    assert(ids(t) == Set(9L, 10L)) // default = latest
    val h = t.history()
    assert(h.map(_.action) == Seq("append", "append", "overwrite"))
    assert(h.map(_.rows) == Seq(2L, 3L, 2L))
  }

  test("rollback is roll-forward: a new version, history intact") {
    val t = new SnapshotTable(spark, freshRoot("rb"))
    t.commitAppend(Seq(1L).toDF("id"))
    val v2 = t.commitAppend(Seq(2L).toDF("id"))
    t.commitOverwrite(Seq(99L).toDF("id"))
    val v4 = t.rollbackTo(v2)
    assert(v4 == 4L && ids(t) == Set(1L, 2L))
    assert(ids(t, 3L) == Set(99L)) // the rolled-back version still resolves
    assert(t.snapshot(v4).action == "rollback")
  }

  test("losing the version race retries on the new tip instead of clobbering") {
    val root = freshRoot("race")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    // simulate a concurrent writer winning v2: publish a manifest that
    // re-lists v1's files (a no-op interloper commit)
    val snaps = new java.io.File(root, "_snapshots")
    val v1Body = scala.io.Source.fromFile(
      new java.io.File(snaps, f"v${1L}%020d.json"))("UTF-8").mkString
    val fake = v1Body.replace("\"version\":1", "\"version\":2")
    val w = new java.io.FileWriter(new java.io.File(snaps, f"v${2L}%020d.json"))
    w.write(fake); w.close()
    // our commit must land at v3 ON TOP of the interloper's tip
    val v = t.commitAppend(Seq(7L).toDF("id"))
    assert(v == 3L, s"expected retry to v3, got v$v")
    assert(ids(t, 3L) == Set(1L, 7L))
  }

  test("readAppendedBetween delivers only the delta, and never re-delivers on rollback") {
    val t = new SnapshotTable(spark, freshRoot("delta"))
    val v1 = t.commitAppend(Seq(1L, 2L).toDF("id"))
    val v2 = t.commitAppend(Seq(3L).toDF("id"))
    val v3 = t.commitAppend(Seq(4L, 5L).toDF("id"))
    def delta(a: Long, b: Long): Set[Long] =
      t.readAppendedBetween(a, b).select("id").as[Long].collect().toSet
    assert(delta(v1, v2) == Set(3L))
    assert(delta(v1, v3) == Set(3L, 4L, 5L))
    assert(delta(0L, v1) == Set(1L, 2L))
    // rollback re-lists old files; an incremental consumer at v3 sees nothing new
    val v4 = t.rollbackTo(v2)
    assert(delta(v3, v4).isEmpty)
  }

  test("SnapshotFollower: checkpointed polls, failure re-delivery, restart resume") {
    val t = new SnapshotTable(spark, freshRoot("follow"))
    val ckpt = freshRoot("followckpt")
    val f = new graft.sources.SnapshotFollower(t, ckpt)
    assert(f.poll(_ => fail("no data yet")).isEmpty)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitAppend(Seq(3L).toDF("id"))
    var seen = Set.empty[Long]
    assert(f.poll(df => seen = df.select("id").as[Long].collect().toSet)
      .contains((0L, 2L)))
    assert(seen == Set(1L, 2L, 3L))
    assert(f.poll(_ => fail("nothing new")).isEmpty) // idle
    t.commitAppend(Seq(4L).toDF("id"))
    // a dying process leaves the offset untouched -> re-delivery
    intercept[RuntimeException](f.poll(_ => throw new RuntimeException("boom")))
    // restart: a NEW follower on the same checkpoint resumes at v2
    val f2 = new graft.sources.SnapshotFollower(t, ckpt)
    assert(f2.poll(df => seen = df.select("id").as[Long].collect().toSet)
      .contains((2L, 3L)))
    assert(seen == Set(4L)) // only the delta, never a re-scan
  }

  test("SnapshotFollower: maxVersionsPerPoll drains a backlog in bounded polls") {
    val t = new SnapshotTable(spark, freshRoot("followcap"))
    val ckpt = freshRoot("followcapckpt")
    (1 to 5).foreach(k => t.commitAppend(Seq(k.toLong).toDF("id")))
    val f = new graft.sources.SnapshotFollower(t, ckpt, maxVersionsPerPoll = 2L)
    val ranges = Iterator.continually(f.poll(_ => ()))
      .takeWhile(_.isDefined).flatten.toSeq
    assert(ranges == Seq((0L, 2L), (2L, 4L), (4L, 5L)),
      s"5 versions at 2 per poll, got $ranges")
    // an uncapped follower on the same checkpoint sees nothing new
    assert(new graft.sources.SnapshotFollower(t, ckpt).poll(_ => ()).isEmpty)
  }

  test("readRange prunes files by manifest min/max stats; results stay exact") {
    val t = new SnapshotTable(spark, freshRoot("stats"), statsCols = Seq("id"))
    // three commits with disjoint id bands, one file each
    t.commitAppend((1L to 10L).toDF("id").repartition(1))
    t.commitAppend((11L to 20L).toDF("id").repartition(1))
    t.commitAppend((21L to 30L).toDF("id").repartition(1))
    assert(t.read().inputFiles.length == 3)
    val mid = t.readRange(12L, 15L)
    assert(mid.inputFiles.length == 1, "only the middle band's file should plan")
    assert(mid.select("id").as[Long].collect().toSet == (12L to 15L).toSet)
    // a band-straddling range plans two files, never three
    val straddle = t.readRange(9L, 12L)
    assert(straddle.inputFiles.length == 2)
    assert(straddle.select("id").as[Long].collect().toSet == (9L to 12L).toSet)
    // out-of-band lookup plans zero files
    assert(t.readRange(100L, 200L).inputFiles.isEmpty)
    // stats survive rollback re-listing
    t.commitAppend((31L to 40L).toDF("id").repartition(1))
    t.rollbackTo(3L)
    assert(t.readRange(12L, 15L).inputFiles.length == 1)
  }

  test("commitAppendChecked rejects a violating batch before any file is written") {
    val root = freshRoot("gate")
    val t = new SnapshotTable(spark, root)
    val suite = Seq(graft.checks.NonNull(Seq("name"), name = "nn"),
      graft.checks.RowCountMin(1, name = "mn"))
    val bad = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "name")
    val e = intercept[IllegalStateException](t.commitAppendChecked(bad, suite))
    assert(e.getMessage.contains("nn(1)"), e.getMessage)
    assert(t.latestVersion() == 0L, "no version must be published")
    assert(!new java.io.File(root, "data").exists(), "no orphan data files")
    // the clean batch commits through the same gate
    val good = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    assert(t.commitAppendChecked(good, suite) == 1L)
    assert(t.read().count() == 2L)
  }

  test("compact is a dataChange=false version: fewer files, same rows, followers skip it") {
    val t = new SnapshotTable(spark, freshRoot("compactv"))
    val ckpt = freshRoot("compactckpt")
    (1 to 6).foreach(i => t.commitAppend(Seq(i.toLong).toDF("id").repartition(1)))
    assert(t.read().inputFiles.length == 6)
    val f = new graft.sources.SnapshotFollower(t, ckpt)
    f.poll(df => assert(df.count() == 6L)) // consumer is current pre-compact
    val vc = t.compact(targetRowsPerFile = 10L)
    assert(!t.snapshot(vc).dataChange)
    assert(t.read().inputFiles.length == 1 && ids(t) == (1L to 6L).toSet)
    // maintenance must NOT re-deliver the table to the change feed
    assert(f.poll(df => assert(df.isEmpty, s"re-delivered: ${df.collect().toSeq}"))
      .contains((6L, 7L)))
    // an append after compaction delivers exactly its own rows
    t.commitAppend(Seq(7L).toDF("id"))
    var seen = Set.empty[Long]
    f.poll(df => seen = df.select("id").as[Long].collect().toSet)
    assert(seen == Set(7L))
    // time travel to a pre-compact version still resolves
    assert(t.read(3L).count() == 3L)
  }

  test("commitUpsert merges by key; commitDelete removes rows; history keeps both") {
    val t = new SnapshotTable(spark, freshRoot("dml"))
    t.commitAppend(Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "w"))
    // true-MERGE: matched keys take the batch's row unconditionally
    // (the watermark orders WITHIN the batch — id=2 keeps w=20 over w=15)
    t.commitUpsert(Seq((2L, "B", 20L), (2L, "old", 15L), (3L, "c", 20L))
      .toDF("id", "v", "w"), uniqueKey = Seq("id"), watermarkCol = "w")
    val afterUpsert = t.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(afterUpsert == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    val vDel = t.commitDelete(col("id") === 2L)
    assert(t.read().select("id").as[Long].collect().toSet == Set(1L, 3L))
    // time travel still sees the deleted row; actions recorded
    assert(t.read(vDel - 1).select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(t.history().map(_.action) == Seq("append", "upsert", "delete"))
  }

  test("commitRewrite re-derives from the new tip when a concurrent commit wins") {
    val root = freshRoot("rmw")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    val other = new SnapshotTable(spark, root)
    var calls = 0
    val v = t.commitRewrite("delete") { cur =>
      calls += 1
      if (calls == 1) other.commitAppend(Seq(99L).toDF("id")) // interloper mid-flight
      cur.get.filter(col("id") =!= 1L)
    }
    // first attempt lost the version race; the retry derived from the
    // interloper's tip, so 99 SURVIVES instead of being silently dropped
    assert(calls == 2, s"expected a re-derive, transform ran $calls time(s)")
    assert(v == 3L)
    assert(ids(t) == Set(2L, 99L))
  }

  test("readEvolved merges schemas across commits; missing columns read null") {
    val t = new SnapshotTable(spark, freshRoot("evolve"))
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitAppend(Seq((3L, "x")).toDF("id", "tag")) // commit adds a column
    val evolved = t.readEvolved()
    assert(evolved.columns.toSet == Set("id", "tag"))
    val byId = evolved.select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some("x")))
  }

  test("commitAppendOnce: a replayed epoch no-ops at its original version") {
    val t = new SnapshotTable(spark, freshRoot("once"))
    val v1 = t.commitAppendOnce(0L, Seq(1L, 2L).toDF("id"))
    val v2 = t.commitAppendOnce(1L, Seq(3L).toDF("id"))
    // failure replay of epoch 1: same version back, no double-append
    assert(t.commitAppendOnce(1L, Seq(3L).toDF("id")) == v2)
    assert((v1, v2) == (1L, 2L))
    assert(t.latestVersion() == 2L && ids(t) == Set(1L, 2L, 3L))
    assert(t.snapshot(v2).batchId == 1L && t.snapshot(v1).batchId == 0L)
  }

  test("runSnapshotIngestJob lands micro-batches as snapshot commits, exactly-once on restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snapingest").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    Seq(
      (1L, ts0, 7L, "click", 1.0, "{}"),
      (2L, ts0, 8L, "view", 2.0, "{}"),
      (3L, ts0, 9L, "view", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    graft.streaming.EventsStream.runSnapshotIngestJob(
      spark, s"$dir/in", s"$dir/table", s"$dir/ckpt")
    val t = new SnapshotTable(spark, s"$dir/table")
    val v = t.latestVersion()
    assert(v >= 1L && t.read().count() == 3L)
    // restart on the same checkpoint: no new data, no new version
    graft.streaming.EventsStream.runSnapshotIngestJob(
      spark, s"$dir/in", s"$dir/table", s"$dir/ckpt")
    assert(t.latestVersion() == v && t.read().count() == 3L)
    // a follower downstream sees the ingested rows exactly once
    val f = new graft.sources.SnapshotFollower(t, s"$dir/followckpt")
    var n = -1L
    f.poll(df => n = df.count())
    assert(n == 3L && f.poll(_ => fail("nothing new")).isEmpty)
  }

  test("an empty batch still commits a schema-bearing version") {
    val t = new SnapshotTable(spark, freshRoot("empty"))
    t.commitAppend(Seq(1L).toDF("id"))
    // DELETE-all and overwrite-with-empty both land manifests whose files
    // carry the schema — read() stays plannable at zero rows
    val v2 = t.commitOverwrite(Seq.empty[Long].toDF("id"))
    assert(t.read(v2).count() == 0L)
    assert(t.read(v2).schema.fieldNames.toSeq == Seq("id"))
    val v3 = t.commitDelete(col("id") >= 0L) // removes nothing (table empty)
    assert(t.read(v3).count() == 0L)
    assert(t.snapshot(v2).files.nonEmpty && t.snapshot(v3).files.nonEmpty)
    // and the table recovers: a later append reads normally
    t.commitAppend(Seq(7L).toDF("id"))
    assert(ids(t) == Set(7L))
  }

  test("follower tolerates a pre-existing offset after successful processing") {
    val dir = freshRoot("offcol")
    val t = new SnapshotTable(spark, s"$dir/table")
    t.commitAppend(Seq(1L).toDF("id"))
    val ckpt = s"$dir/ckpt"
    // pre-create the offset another poll of the same checkpoint would
    // write for tip v1 — poll must process and NOT throw on the collision
    val offsets = new java.io.File(ckpt, "offsets")
    offsets.mkdirs()
    new java.io.File(offsets, f"o${1L}%020d").createNewFile()
    val f = new graft.sources.SnapshotFollower(t, ckpt)
    assert(f.lastConsumed() == 1L && f.poll(_ => fail("already consumed")).isEmpty)
    t.commitAppend(Seq(2L).toDF("id"))
    var n = -1L
    // the racing poll commits tip v2 WHILE this poll is processing — the
    // collision at offset-write time must not fail the completed work
    val r = f.poll { df =>
      n = df.count()
      new java.io.File(offsets, f"o${2L}%020d").createNewFile()
    }
    assert(r.contains((1L, 2L)) && n == 1L)
  }

  test("commitAppendOnce dedup probe stops at older epochs, not full history") {
    val t = new SnapshotTable(spark, freshRoot("epochprobe"))
    (0L to 3L).foreach(e => t.commitAppendOnce(e, Seq(e).toDF("id")))
    t.commitOverwrite(Seq(100L).toDF("id")) // non-append interleaved
    // replay of epoch 3 resolves to its original version (walks past the
    // overwrite, stops once it sees epoch-3's own append)
    assert(t.commitAppendOnce(3L, Seq(999L).toDF("id")) == 4L)
    // a NEW epoch probes back only to the first older epoch and commits
    val v = t.commitAppendOnce(4L, Seq(4L).toDF("id"))
    assert(v == 6L && ids(t).contains(4L) && !ids(t).contains(999L))
  }

  test("merge-on-read delete: manifest-only commit, readers anti-join, re-insert survives") {
    val t = new SnapshotTable(spark, freshRoot("mor"))
    val v1 = t.commitAppend(Seq(1L, 2L, 3L).toDF("id"))
    val dataFilesBefore = t.snapshot(v1).files.toSet
    val v2 = t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    // the delete re-lists v1's data files untouched — no rewrite happened
    assert(t.snapshot(v2).files.toSet == dataFilesBefore)
    assert(t.snapshot(v2).deletes.nonEmpty && t.snapshot(v2).rows == 2L)
    assert(ids(t) == Set(1L, 3L))
    assert(ids(t, v1) == Set(1L, 2L, 3L)) // time travel ignores the later delete
    // sequencing: re-appending the deleted key resurrects it (the delete
    // applies only to files committed before it)
    val v3 = t.commitAppend(Seq(2L).toDF("id"))
    assert(ids(t, v3) == Set(1L, 2L, 3L) && t.snapshot(v3).rows == 3L)
    // a second MOR delete stacks; both apply to their older files only
    val v4 = t.commitDeleteByKey(Seq(1L, 2L).toDF("id"), Seq("id"))
    assert(ids(t, v4) == Set(3L) && t.snapshot(v4).rows == 1L)
    // compact materializes the deletes: no delete files at the new tip,
    // same contents, change-feed-invisible
    val v5 = t.compact(targetRowsPerFile = 10L)
    assert(t.snapshot(v5).deletes.isEmpty && !t.snapshot(v5).dataChange)
    assert(ids(t, v5) == Set(3L))
    assert(t.readAppendedBetween(v4, v5).count() == 0L)
  }

  test("MOR delete composes with stats pruning, schema evolution, and vacuum") {
    val t = new SnapshotTable(spark, freshRoot("morx"), statsCols = Seq("id"))
    t.commitAppend(spark.range(0L, 50L).toDF("id"))
    t.commitAppend(spark.range(50L, 100L).toDF("id"))
    t.commitDeleteByKey(Seq(10L, 60L).toDF("id"), Seq("id"))
    // pruned read still applies the delete
    val r = t.readRange(0L, 20L).select("id").as[Long].collect().toSet
    assert(r == (0L to 20L).toSet - 10L)
    // evolved commit adds a column; MOR delete on old files still applies
    val v = t.commitAppend(Seq((200L, "x")).toDF("id", "tag"))
    val ev = t.readEvolved(v)
    assert(ev.count() == 99L && ev.filter(col("tag") === "x").count() == 1L)
    // vacuum keeps delete files reachable from the retained tip
    t.vacuum(keepLast = 1)
    assert(ids(t) == ((0L until 100L).toSet - 10L - 60L) + 200L)
  }

  test("readChangeFeed emits inserts, MOR-delete pre-images, and rewrite diffs") {
    val t = new SnapshotTable(spark, freshRoot("cdf"))
    val v1 = t.commitAppend(
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "s", "w"))
    val v2 = t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    val v3 = t.compact(targetRowsPerFile = 100L) // invisible in the feed
    val v4 = t.commitUpsert(Seq((3L, "C", 2L), (4L, "d", 2L)).toDF("id", "s", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    def feed(a: Long, b: Long): Set[(Long, String, String, Long)] =
      t.readChangeFeed(a, b).select("id", "s", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
    assert(feed(0L, v1) == Set((1L, "a", "insert", v1), (2L, "b", "insert", v1),
      (3L, "c", "insert", v1)))
    // MOR delete retracts its pre-image (the append feed would show nothing)
    assert(feed(v1, v2) == Set((2L, "b", "delete", v2)))
    assert(feed(v2, v3).isEmpty)
    // upsert rewrote the table: the feed derives update = delete + insert
    // (upsert carries w; unionByName null-fills, so project id/s only)
    assert(feed(v3, v4).map(r => (r._1, r._2, r._3)) ==
      Set((3L, "c", "delete"), (3L, "C", "insert"), (4L, "d", "insert")))
    // end-to-end replay reconstructs the tip
    val replay = t.readChangeFeed(0L, v4)
    val net = replay.groupBy("id", "s")
      .agg((count(when(col("_change_type") === "insert", 1)) -
        count(when(col("_change_type") === "delete", 1))).as("n"))
      .filter(col("n") > 0).select("id", "s").as[(Long, String)].collect().toSet
    assert(net == t.read().select("id", "s").as[(Long, String)].collect().toSet)
  }

  test("commitReplaceWhere rewrites only straddling files; clustered reload is manifest-only") {
    val t = new SnapshotTable(spark, freshRoot("replw"), statsCols = Seq("id"))
    // range-clustered layout: one file per decade
    t.commitAppend(spark.range(0L, 10L).toDF("id").repartition(1))
    t.commitAppend(spark.range(10L, 20L).toDF("id").repartition(1))
    t.commitAppend(spark.range(20L, 30L).toDF("id").repartition(1))
    val before = t.snapshot(t.latestVersion()).files
    // clustered case: [10,19] exactly covers file 2 — no straddlers, so
    // files 1 and 3 are re-listed untouched
    val v = t.commitReplaceWhere(Seq(11L, 12L).toDF("id"), 10L, 19L)
    val after = t.snapshot(v)
    assert(after.rows == 22L && after.action == "replace_where")
    assert(before.count(after.files.contains) == 2, "untouched files re-listed")
    assert(ids(t) == ((0L until 10L) ++ Seq(11L, 12L) ++ (20L until 30L)).toSet)
    // straddling case: [5,24] cuts into the kept decades — they are
    // surgically rewritten, range content replaced by the batch
    val v2 = t.commitReplaceWhere(Seq(7L, 21L).toDF("id"), 5L, 24L)
    assert(ids(t, v2) == ((0L until 5L) ++ Seq(7L, 21L) ++ (25L until 30L)).toSet)
    assert(t.snapshot(v2).rows == 12L)
    // batch outside the range is rejected before any commit
    intercept[IllegalArgumentException](
      t.commitReplaceWhere(Seq(99L).toDF("id"), 0L, 4L))
    // composes with MOR deletes: delete keys outside the range survive
    // in kept files; the replace applies them when rewriting straddlers
    t.commitDeleteByKey(Seq(0L, 29L).toDF("id"), Seq("id"))
    val v4 = t.commitReplaceWhere(Seq(26L).toDF("id"), 26L, 28L)
    assert(ids(t, v4) == (Seq(1L, 2L, 3L, 4L, 7L, 21L, 25L, 26L)).toSet)
  }

  test("clustered compaction tightens stats: readRange plans fewer files, replaceWhere goes surgical") {
    val t = new SnapshotTable(spark, freshRoot("clust"), statsCols = Seq("id"))
    // interleaved appends: every file spans the whole id range
    (0 until 4).foreach(r =>
      t.commitAppend(spark.range(0L, 100L).filter(col("id") % 4 === r)
        .toDF("id").repartition(1)))
    def planned(lo: Long, hi: Long): Int = t.readRange(lo, hi).inputFiles.length
    assert(planned(10L, 19L) == 4, "interleaved layout: every file overlaps")
    val v = t.compact(targetRowsPerFile = 25L, clusterBy = Some("id"))
    assert(!t.snapshot(v).dataChange && t.snapshot(v).rows == 100L)
    // clustered layout: a 10-wide probe hits 1-2 of the 4 range files
    assert(planned(10L, 19L) <= 2, s"expected pruned plan, got ${planned(10L, 19L)}")
    assert(t.readRange(10L, 19L).select("id").as[Long].collect().toSet ==
      (10L to 19L).toSet)
    // replaceWhere on a clustered band: at most one straddler per edge
    val before = t.snapshot(t.latestVersion()).files
    val v2 = t.commitReplaceWhere(Seq(30L).toDF("id"), 25L, 49L)
    assert(before.count(t.snapshot(v2).files.contains) >= 2,
      "files fully outside the band must be re-listed untouched")
    assert(t.read().count() == 76L) // 100 - 25 + 1
  }

  test("concurrent writers: every append lands, versions stay contiguous, rows exact") {
    val t = new SnapshotTable(spark, freshRoot("race8"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { w =>
      scala.concurrent.Future {
        t.commitAppend(Seq(w.toLong * 100L, w.toLong * 100L + 1L).toDF("id"))
      }
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    // create-exclusive publish: one winner per version, losers retried —
    // the eight commits occupy exactly versions 1..8
    assert(versions.sorted == (1L to 8L))
    assert(t.snapshot(8L).rows == 16L && t.read().count() == 16L)
    assert(ids(t) == (0 until 8).flatMap(w => Seq(w * 100L, w * 100L + 1L)).toSet)
    // every intermediate version is consistent: rows grow by 2 per commit
    assert(t.history().map(_.rows) == (1L to 8L).map(_ * 2))
  }

  test("MOR read plan: the delete-key side broadcasts (no sort-merge shuffle of the table)") {
    val t = new SnapshotTable(spark, freshRoot("morplan"))
    t.commitAppend(spark.range(0L, 50000L).toDF("id"))
    t.commitDeleteByKey(Seq(5L, 6L).toDF("id"), Seq("id"))
    val plan = t.read().queryExecution.executedPlan.toString
    // delete keys are commit-sized parquet: the anti-join's build side
    // must come off file-size stats as a broadcast, never a sort-merge
    // that would shuffle the whole table to remove two keys
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"table-sized shuffle in MOR read:\n$plan")
  }

  test("readAsOf: timestamp time travel with monotonic clock adjustment") {
    val root = freshRoot("asof")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    t.commitAppend(Seq(2L).toDF("id"))
    assert(t.versionAsOf(between) == 1L)
    assert(t.readAsOf(between).count() == 1L)
    assert(t.readAsOf(System.currentTimeMillis()).count() == 2L)
    // before the first commit: unanswerable, raises
    intercept[IllegalArgumentException](t.versionAsOf(t.snapshot(1L).ts - 1000L))
    // a skewed writer stamping v3 in the past must not shadow v2:
    // monotonic adjustment reads v3's effective ts as >= v2's
    val snaps = new java.io.File(root, "_snapshots")
    t.commitAppend(Seq(3L).toDF("id"))
    val f3 = new java.io.File(snaps, f"v${3L}%020d.json")
    val body = scala.io.Source.fromFile(f3)("UTF-8").mkString
    val skewed = body.replaceAll(""""ts":\d+""", """"ts":1""")
    val w = new java.io.FileWriter(f3); w.write(skewed); w.close()
    assert(t.versionAsOf(between) == 1L, "skewed v3 must not be eligible at `between`")
    assert(t.versionAsOf(System.currentTimeMillis()) == 3L)
  }

  test("compact losing the version race re-derives from the new tip (no lost update)") {
    val root = freshRoot("compactrace")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    // interloper wins v2 (re-lists v1's files) before compact publishes
    val snaps = new java.io.File(root, "_snapshots")
    val v1Body = scala.io.Source.fromFile(
      new java.io.File(snaps, f"v${1L}%020d.json"))("UTF-8").mkString
    val w = new java.io.FileWriter(new java.io.File(snaps, f"v${2L}%020d.json"))
    w.write(v1Body.replace("\"version\":1", "\"version\":2")); w.close()
    // compact read v1 or v2 as its base; losing the race at one version
    // must RE-READ the tip, not re-publish stale content on top of it
    val v = t.compact(targetRowsPerFile = 100L)
    assert(v == 3L && t.snapshot(v).action == "compact")
    assert(!t.snapshot(v).dataChange && t.snapshot(v).rows == 2L)
    assert(ids(t, v) == Set(1L, 2L))
  }

  test("replaceWhere keeps NULL-key rows in straddlers and rejects NULL-key batches") {
    val t = new SnapshotTable(spark, freshRoot("replnull"), statsCols = Seq("id"))
    t.commitAppend(Seq(Some(1L), Some(5L), None).toDF("id").repartition(1))
    // the NULL-key row is outside every range: it must survive the
    // straddler rewrite, and the row count must stay exact
    val v = t.commitReplaceWhere(Seq(Some(4L)).toDF("id"), 3L, 9L)
    assert(t.snapshot(v).rows == 3L)
    assert(t.read(v).select("id").as[Option[Long]].collect().toSet ==
      Set(Some(1L), Some(4L), None))
    // a batch carrying a NULL key cannot be range-validated: reject
    intercept[IllegalArgumentException](
      t.commitReplaceWhere(Seq(Some(5L), None).toDF("id"), 3L, 9L))
  }

  test("vacuum deletes only unreachable files; retained tip still reads") {
    val root = freshRoot("vac")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitOverwrite(Seq(5L).toDF("id"))
    def parquetCount(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root, "data")).count(_.getName.endsWith(".parquet"))
    }
    val before = parquetCount()
    t.vacuum(keepLast = 1)
    assert(parquetCount() < before, "v1's files should be gone")
    assert(ids(t) == Set(5L))
    assert(t.history().map(_.version) == Seq(2L)) // v1 manifest dropped
    // vacuumed version no longer resolves FROM A FRESH HANDLE (a live
    // handle may still serve v1 from its immutable-manifest cache —
    // vacuum is GC, not a semantic change; see the manifestCache doc)
    intercept[Exception](new SnapshotTable(spark, root).read(1L))
  }

  test("vacuum's distributed sweep agrees with the driver-side one") {
    val root = freshRoot("vacdist")
    val t = new SnapshotTable(spark, root)
    // several commit dirs, then orphan most of them behind the horizon
    (0 until 5).foreach(i =>
      t.commitAppend(Seq(i.toLong, i + 100L).toDF("id").repartition(1)))
    t.commitOverwrite(Seq(42L).toDF("id").repartition(1))
    def parquetCount(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root, "data")).count(_.getName.endsWith(".parquet"))
    }
    // force the executor-side sweep job (threshold 1 <= 6 commit dirs)
    spark.conf.set("spark.graft.vacuum.distributedSweepAt", "1")
    try t.vacuum(keepLast = 1)
    finally spark.conf.unset("spark.graft.vacuum.distributedSweepAt")
    assert(parquetCount() == 1, "only the tip's file survives the sweep")
    assert(ids(t) == Set(42L))
    assert(t.checkTable().ok)
  }

  test("vacuum never sweeps a FRESH never-referenced file (in-flight publish race)") {
    val root = freshRoot("vacrace")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    // simulate an in-flight commit: data files on disk, manifest not yet
    // published (every commit path writes data before its manifest CAS)
    val dir = new java.io.File(root, "data/inflight-uuid")
    dir.mkdirs()
    val fresh = new java.io.File(dir, "part-00000-inflight.parquet")
    Seq(9L).toDF("id").repartition(1).write.mode("overwrite")
      .parquet(s"$root/tmp_stage")
    val part = new java.io.File(s"$root/tmp_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, fresh.toPath)
    val old = new java.io.File(dir, "part-00001-orphan.parquet")
    java.nio.file.Files.copy(part.toPath, old.toPath)
    old.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    t.vacuum(keepLast = 1)
    assert(fresh.exists(),
      "a fresh never-referenced file may belong to an in-flight publish")
    assert(!old.exists(),
      "a never-referenced file past the age gate is a genuine orphan")
    assert(ids(t) == Set(1L))
  }
}
