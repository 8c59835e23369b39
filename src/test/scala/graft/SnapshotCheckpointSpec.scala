package graft

import graft.sources.SnapshotTable

/** Manifest checkpoints: every N commits the publisher archives the
  * window's raw manifests into one chunk file, so history walks — and
  * everything built on them (versionAsOf, the fresh-txnApp epoch
  * probe) — cost O(V/N) file opens instead of O(V). Plus the vacuum +
  * `_tip` hint interplay: retention drops superseded chunks with their
  * manifests, and a hint pointing into the vacuumed (or torn) range
  * still resolves the tip correctly. */
class SnapshotCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapckpt_$tag")
    f.toFile.delete()
    f.toString
  }

  /** A 100-commit table built almost entirely manifest-only (version 1
    * writes the one real data file; 99 appends re-list it) — the walk
    * under test is metadata, not data. */
  private def hundredCommits(root: String): SnapshotTable = {
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    val s1 = t.snapshot(1L)
    val schema = t.read(1L).schema
    (2 to 100).foreach(_ => t.commitWrittenAppend(s1.files, Seq.empty, 1L, schema))
    t
  }

  test("history + versionAsOf on a 100-commit table: O(V/N) opens, values identical to chunk-less") {
    val root = freshRoot("walk")
    hundredCommits(root)
    val fresh = new SnapshotTable(spark, root) // checkpointEvery = 25
    fresh.metaOpens.set(0)
    val h = fresh.history()
    assert(h.length == 100 && h.map(_.version) == (1L to 100L))
    val opens = fresh.metaOpens.get()
    assert(opens <= 8,
      s"100-version history opened $opens files; 4 chunk reads expected")
    // versionAsOf rides the warmed cache: zero further opens
    fresh.metaOpens.set(0)
    assert(fresh.versionAsOf(h.last.ts) == 100L)
    assert(fresh.metaOpens.get() == 0L)
    // control: a checkpoint-less handle pays one open per version
    val naive = new SnapshotTable(spark, root, checkpointEvery = 0)
    naive.metaOpens.set(0)
    naive.history()
    assert(naive.metaOpens.get() >= 100,
      s"control without chunks should open every manifest (${naive.metaOpens.get()})")
    // chunk-served snapshots are bit-identical to direct parses
    (Seq(1L, 25L, 42L, 99L, 100L)).foreach { v =>
      assert(fresh.snapshot(v) == naive.snapshot(v), s"v$v chunk vs direct")
    }
  }

  test("fresh-txnApp epoch-0 probe is bounded by chunks, then commits normally") {
    val root = freshRoot("probe")
    hundredCommits(root)
    val t = new SnapshotTable(spark, root)
    t.metaOpens.set(0)
    // no same-txnApp epoch ever stops this walk: it visits all 100
    // versions — but through 4 chunk opens, not 100 manifest opens
    val v = t.commitAppendOnce("fresh-query", 0L, Seq(2L).toDF("id"))
    assert(v == 101L)
    val opens = t.metaOpens.get()
    assert(opens <= 8, s"probe+commit opened $opens files; chunks should bound it")
    // and the probe finds its own commit afterwards (replay no-ops)
    assert(t.commitAppendOnce("fresh-query", 0L, Seq(99L).toDF("id")) == 101L)
  }

  test("history scalar sidecars serve the walk alone; a torn sidecar falls back per window") {
    val root = freshRoot("sidecar")
    hundredCommits(root)
    val dir = new java.io.File(s"$root/_snapshots")
    assert(dir.list().count(_.startsWith("h")) == 4,
      s"4 summary sidecars expected: ${dir.list().toSeq}")
    // delete every raw-body CHUNK: the history walk must come entirely
    // from the sidecars (chunk texts re-list all files per version —
    // O(V²) bytes; sidecars are O(V) scalars)
    dir.listFiles().filter(_.getName.startsWith("c")).foreach(_.delete())
    val fresh = new SnapshotTable(spark, root)
    fresh.metaOpens.set(0)
    val h = fresh.history()
    assert(h.length == 100)
    assert(fresh.metaOpens.get() <= 4,
      s"sidecar walk opened ${fresh.metaOpens.get()} files; 4 expected")
    // every scalar identical to direct per-manifest parses
    val naive = new SnapshotTable(spark, root, checkpointEvery = 0)
    assert(h == naive.history(), "sidecar summaries must equal direct parses")
    // torn sidecar (garbage content): that window falls back to its
    // manifests — correct, just costlier
    java.nio.file.Files.write(
      new java.io.File(dir, f"h${50L}%020d.json").toPath,
      "{torn".getBytes("UTF-8"))
    val fallback = new SnapshotTable(spark, root)
    assert(fallback.history() == naive.history())
  }

  test("vacuum drops superseded chunks with their manifests; hints into the vacuumed range still resolve") {
    val root = freshRoot("vac")
    val t = hundredCommits(root)
    t.vacuum(keepLast = 10) // keepFrom = 91
    val names = new java.io.File(s"$root/_snapshots").list().toSeq
    assert(names.count(_.startsWith("c")) == 1 &&
      names.exists(n => n.startsWith("c") && n.contains("100")),
      s"only the boundary chunk c100 should remain: $names")
    assert(names.count(_.startsWith("h")) == 1,
      s"summary sidecars below the horizon go with their chunks: $names")
    assert(names.count(n => n.startsWith("v") && n.endsWith(".json")) == 10)
    val after = new SnapshotTable(spark, root)
    assert(after.latestVersion() == 100L)
    assert(after.history().map(_.version) == (91L to 100L))
    // _tip hint pointing INTO the vacuumed range: probe misses, listing
    // fallback resolves the true tip
    val hint = new java.io.File(s"$root/_snapshots/_tip")
    java.nio.file.Files.write(hint.toPath, "5".getBytes("UTF-8"))
    assert(new SnapshotTable(spark, root).latestVersion() == 100L)
    // torn/garbage hint: same fallback
    java.nio.file.Files.write(hint.toPath, "not-a-number".getBytes("UTF-8"))
    assert(new SnapshotTable(spark, root).latestVersion() == 100L)
    // stale-but-retained hint: forward probe walks to the tip
    java.nio.file.Files.write(hint.toPath, "93".getBytes("UTF-8"))
    assert(new SnapshotTable(spark, root).latestVersion() == 100L)
  }
}
