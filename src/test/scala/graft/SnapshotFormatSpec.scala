package graft

import org.apache.spark.sql.functions._
import graft.sources.{ConditionalPutLogStore, NonAtomicLogStore, SnapshotLogStore, SnapshotTable}

/** Round-11 snapshot-format upgrades: NULL-safe replaceWhere file
  * classification, multi-column data skipping, commit-time schema
  * evolution with pinned-schema reads, the `_tip` pointer's bounded
  * metadata cost, the LogStore commit-safety matrix, and publish-failure
  * discipline. */
class SnapshotFormatSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapfmt_$tag")
    f.toFile.delete()
    f.toString
  }

  test("replaceWhere: a fully-inside file carrying NULL keys is rewritten, not dropped") {
    val t = new SnapshotTable(spark, freshRoot("replnullin"), statsCols = Seq("id"))
    // ONE file whose non-null values lie entirely inside the replace
    // range but which also carries NULL-key rows: min/max stats ignore
    // NULLs, so a stats-only classifier would call it fully-inside and
    // drop it whole — deleting the NULL rows silently
    val withNulls = Seq(Some(10L), Some(12L), Some(15L), None, None)
      .toDF("id").withColumn("v", coalesce(col("id"), lit(-1L)))
      .repartition(1)
    t.commitAppend(withNulls)
    // also a fully-inside file WITHOUT nulls: that one may drop whole
    t.commitAppend(Seq(11L, 13L).toDF("id").withColumn("v", col("id")).repartition(1))
    val v = t.commitReplaceWhere(
      Seq(14L).toDF("id").withColumn("v", lit(140L)), 10L, 20L)
    val out = t.read(v).select("id", "v").collect()
    // every non-null key in [10,20] was replaced by the batch...
    assert(out.collect { case r if !r.isNullAt(0) => r.getLong(0) }.toSet == Set(14L))
    // ...and BOTH NULL-key rows survived the rewrite
    assert(out.count(_.isNullAt(0)) == 2,
      s"NULL stats-key rows must survive replaceWhere: ${out.mkString(",")}")
    // published row count is exact, not overstated
    assert(t.snapshot(v).rows == out.length)
  }

  test("multi-column stats: readRange prunes on the second column; replaceWhere stays file-surgical on it") {
    val t = new SnapshotTable(spark, freshRoot("twocol"), statsCols = Seq("a", "b"))
    // three files, disjoint on BOTH columns (a ascending, b descending)
    t.commitAppend((1L to 10L).toDF("a").withColumn("b", col("a") + 200L).repartition(1))
    t.commitAppend((11L to 20L).toDF("a").withColumn("b", col("a") + 100L).repartition(1))
    t.commitAppend((21L to 30L).toDF("a").withColumn("b", col("a")).repartition(1))
    assert(t.read().inputFiles.length == 3)
    // prune on the SECOND stats column: only the middle file's b-band matches
    val mid = t.readRange("b", 112L, 118L, -1L)
    assert(mid.inputFiles.length == 1, "b-band pruning should plan exactly one file")
    assert(mid.select("a").as[Long].collect().toSet == (12L to 18L).toSet)
    // replaceWhere keyed on b: outer files untouched (file-name survival)
    val before = t.snapshot(t.latestVersion()).files
    val v = t.commitReplaceWhere("b",
      Seq((99L, 115L)).toDF("a", "b"), 111L, 120L)
    val untouched = before.count(t.snapshot(v).files.contains)
    assert(untouched == 2, s"outer b-band files must survive by name, got $untouched")
    assert(t.read(v).filter(col("b").between(111L, 120L))
      .select("a").as[Long].collect().toSet == Set(99L))
    // rows outside the b-range in the straddling file are preserved
    assert(t.read(v).count() == 30 - 10 + 1)
  }

  test("schema evolution: adds null-fill, int->long widens both ways, incompatible rejects") {
    val t = new SnapshotTable(spark, freshRoot("evolve2"))
    t.commitAppend(Seq((1, "a")).toDF("k", "s")) // k is INT here
    // additive column: allowed; old rows read NULL for it
    t.commitAppend(Seq((2, "b", 20L)).toDF("k", "s", "extra"))
    // widening: batch has LONG k — table schema widens, old INT32 files upcast
    t.commitAppend(Seq((3L, "c", 30L)).toDF("k", "s", "extra"))
    val tip = t.read()
    assert(tip.schema("k").dataType == org.apache.spark.sql.types.LongType)
    assert(tip.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(tip.filter(col("k") === 1).select("extra").collect().head.isNullAt(0))
    // NARROW batch after widening: int k widens up into the table's long
    t.commitAppend(Seq((4, "d", 40L)).toDF("k", "s", "extra"))
    assert(t.read().select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // time travel: v1 reads with ITS schema (int k, no extra column)
    val v1 = t.read(1L)
    assert(v1.schema("k").dataType == org.apache.spark.sql.types.IntegerType)
    assert(!v1.columns.contains("extra"))
    // incompatible type change rejected at commit time, table unchanged
    val tipBefore = t.latestVersion()
    val e = intercept[IllegalArgumentException](
      t.commitAppend(Seq(("oops", "e")).toDF("k", "s")))
    assert(e.getMessage.contains("'k'"), e.getMessage)
    assert(t.latestVersion() == tipBefore)
  }

  test("tip pointer: reads do zero directory listings and O(1) probes; torn hint falls back") {
    val root = freshRoot("tip")
    val t = new SnapshotTable(spark, root)
    (1 to 5).foreach(i => t.commitAppend(Seq(i.toLong).toDF("id")))
    // a FRESH handle (counters at zero) resolving the tip via the hint
    val reader = new SnapshotTable(spark, root)
    assert(reader.latestVersion() == 5L)
    assert(reader.metaLists.get() == 0L,
      "hinted tip discovery must not list the manifest directory")
    assert(reader.metaProbes.get() <= 3L, // hint read + hint manifest + tip+1 miss
      s"expected O(1) probes, got ${reader.metaProbes.get()}")
    // stale hint (concurrent writer published past it): probe forward
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintPath = new org.apache.hadoop.fs.Path(s"$root/_snapshots/_tip")
    val out = fs.create(hintPath, true); out.write("3".getBytes("UTF-8")); out.close()
    val r2 = new SnapshotTable(spark, root)
    assert(r2.latestVersion() == 5L && r2.metaLists.get() == 0L)
    // torn/garbage hint: falls back to listing, still correct
    val out2 = fs.create(hintPath, true); out2.write("not-a-number".getBytes); out2.close()
    val r3 = new SnapshotTable(spark, root)
    assert(r3.latestVersion() == 5L && r3.metaLists.get() == 1L)
    // missing hint entirely (pre-tip tables): listing fallback
    fs.delete(hintPath, false)
    val r4 = new SnapshotTable(spark, root)
    assert(r4.latestVersion() == 5L && r4.metaLists.get() == 1L)
  }

  test("LogStore matrix: check-then-act PUT loses a commit; conditional PUT closes the race") {
    // the UNSAFE store: a barrier holds BOTH writers past the exists
    // check before either writes — the deterministic HEAD-then-PUT
    // anomaly: both blind-PUT v1, both report success, one commit gone
    val unsafeRoot = freshRoot("unsafe")
    // the barrier holds both past the CHECK; the arrival-index sleep then
    // staggers the blind PUTs so the last write lands whole (two truly
    // concurrent overwrites can also tear the file — an even worse
    // anomaly, but one the assertions below couldn't read back)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val unsafe = new NonAtomicLogStore(() => {
      val arrival = barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
      if (arrival == 0) Thread.sleep(500)
    })
    val u1 = new SnapshotTable(spark, unsafeRoot, logStore = Some(unsafe))
    val u2 = new SnapshotTable(spark, unsafeRoot, logStore = Some(unsafe))
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); u1.commitAppend(Seq(1L).toDF("id")) } })
    val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); u2.commitAppend(Seq(2L).toDF("id")) } })
    start.countDown()
    val (v1, v2) = (f1.get(), f2.get())
    pool.shutdown()
    assert(v1 == 1L && v2 == 1L, "both writers must claim the same version (the anomaly)")
    val survivors = u1.read().select("id").as[Long].collect().toSet
    assert(survivors.size == 1,
      s"check-then-act must lose one of the two commits, table has $survivors")

    // the SAFE store under the same schedule: one writer wins v1, the
    // loser sees the collision and lands at v2 — nothing lost
    val safeRoot = freshRoot("safe")
    val s1 = new SnapshotTable(spark, safeRoot, logStore = Some(ConditionalPutLogStore))
    val s2 = new SnapshotTable(spark, safeRoot, logStore = Some(ConditionalPutLogStore))
    val start2 = new java.util.concurrent.CountDownLatch(1)
    val pool2 = java.util.concurrent.Executors.newFixedThreadPool(2)
    val g1 = pool2.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start2.await(); s1.commitAppend(Seq(1L).toDF("id")) } })
    val g2 = pool2.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start2.await(); s2.commitAppend(Seq(2L).toDF("id")) } })
    start2.countDown()
    val landed = Set(g1.get(), g2.get())
    pool2.shutdown()
    assert(landed == Set(1L, 2L), s"conditional PUT must serialize to v1+v2, got $landed")
    assert(s1.read().select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  /** The REMOTE conditional-PUT shape an S3/GCS LogStore returns on a
    * lost election: a plain IOException carrying the HTTP 412
    * (`If-None-Match: *` / `ifGenerationMatch=0`) — NOT one of the
    * FileAlreadyExists types the filesystem stores raise — with the
    * winner's object fully visible. Atomic all-or-nothing PUT, no temp
    * phase. `rejections` counts simulated 412s so specs can pin the
    * loser path actually ran. */
  private class S3Style412LogStore(rejections: java.util.concurrent.atomic.AtomicInteger)
      extends SnapshotLogStore {
    private val lock = new Object
    override def writeExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                path: org.apache.hadoop.fs.Path,
                                body: Array[Byte]): Unit = lock.synchronized {
      if (fs.exists(path)) {
        rejections.incrementAndGet()
        throw new java.io.IOException(
          s"PUT $path: 412 Precondition Failed (If-None-Match: *)")
      }
      val out = fs.create(path, true) // the PUT: complete body, one shot
      try out.write(body) finally out.close()
    }
  }

  test("object-store rehearsal: a remote 412 rejection is a collision, the loser retries on the new tip") {
    val root = freshRoot("s3put")
    val rejections = new java.util.concurrent.atomic.AtomicInteger
    val store412 = new S3Style412LogStore(rejections)
    val rival = new SnapshotTable(spark, root, logStore = Some(store412))
    // the loser's store: the rival's commit lands (remotely) exactly
    // between the loser picking its version and its PUT — the PUT then
    // comes back 412 with the winner's manifest visible
    var injected = false
    val racing = new SnapshotLogStore {
      override def writeExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                  path: org.apache.hadoop.fs.Path,
                                  body: Array[Byte]): Unit = {
        if (!injected) { injected = true; rival.commitAppend(Seq(99L).toDF("id")) }
        store412.writeExclusive(fs, path, body)
      }
    }
    val loser = new SnapshotTable(spark, root, logStore = Some(racing))
    val v = loser.commitAppend(Seq(1L).toDF("id"))
    // the raw-IOException 412 (no FileAlreadyExistsException type to
    // pattern-match) classified as a collision via the exists probe;
    // the retry was manifest-only on the new tip — both commits present
    assert(rejections.get() == 1, "the 412 loser path must have run")
    assert(v == 2L, s"loser must land at v2, got v$v")
    assert(loser.read().select("id").as[Long].collect().toSet == Set(99L, 1L))
    // PUT visibility is all-or-nothing: the winner's manifest parses
    // whole (no temp files for a reader or vacuum to trip on)
    assert(loser.snapshot(1L).rows == 1L)
    val leftovers = new java.io.File(s"$root/_snapshots").listFiles()
      .map(_.getName).filter(_.startsWith(".tmp_"))
    assert(leftovers.isEmpty, s"conditional PUT stage must not strand temps: ${leftovers.toSeq}")
  }

  test("object-store rehearsal: a 412 mid-rewrite forces a re-derive, never a blind retry") {
    val root = freshRoot("s3rmw")
    val rejections = new java.util.concurrent.atomic.AtomicInteger
    val store412 = new S3Style412LogStore(rejections)
    val rival = new SnapshotTable(spark, root, logStore = Some(store412))
    val t = new SnapshotTable(spark, root, logStore = Some(store412))
    t.commitAppend(Seq(1L, 2L, 3L).toDF("id"))
    // rival appends DURING the loser's read-modify-write derivation: the
    // loser's publish 412s and commitRewrite must RE-DERIVE from the new
    // tip (a blind retry would erase the rival's row)
    var fired = false
    val v = t.commitRewrite("delete") { cur =>
      if (!fired) { fired = true; rival.commitAppend(Seq(100L).toDF("id")) }
      cur.get.filter(col("id") =!= 2L)
    }
    assert(rejections.get() >= 1, "the rewrite loser path must have run")
    assert(v == 3L)
    assert(t.read().select("id").as[Long].collect().toSet == Set(1L, 3L, 100L),
      "the re-derive must keep the rival's concurrent append AND apply the delete")
  }

  test("publish: a persistent (non-collision) failure propagates immediately with its cause") {
    val broken = new SnapshotLogStore {
      override def writeExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                  path: org.apache.hadoop.fs.Path,
                                  body: Array[Byte]): Unit =
        throw new java.io.IOException("Permission denied (simulated)")
    }
    val t = new SnapshotTable(spark, freshRoot("permfail"), logStore = Some(broken))
    val e = intercept[java.io.IOException](t.commitAppend(Seq(1L).toDF("id")))
    assert(e.getMessage.contains("Permission denied"),
      s"the real cause must surface, not a collision give-up: $e")
  }

  test("manifest safety: JSON-breaking delete-key column names are rejected before any write") {
    val t = new SnapshotTable(spark, freshRoot("jsonsafe"))
    t.commitAppend(Seq(1L).toDF("id"))
    val bad = Seq(1L).toDF("id").withColumnRenamed("id", "k\"quote")
    val e = intercept[IllegalArgumentException](
      t.commitDeleteByKey(bad, Seq("k\"quote")))
    assert(e.getMessage.contains("JSON-breaking"))
    assert(t.latestVersion() == 1L, "no partial commit may land")
  }

  private def hadoopFs(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPathOf(root: String, v: Long) =
    new org.apache.hadoop.fs.Path(f"$root/_snapshots/v$v%020d.json")

  private def rewriteManifest(root: String, v: Long)(f: String => String): Unit = {
    val fs = hadoopFs(root)
    val p = manifestPathOf(root, v)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    fs.delete(p, false)
    val out = fs.create(p, true)
    try out.write(f(txt).getBytes("UTF-8")) finally out.close()
  }

  test("manifest-recorded file lengths: commits record them exactly, carried-forward files keep them") {
    val root = freshRoot("lensrec")
    val t = new SnapshotTable(spark, root, statsCols = Seq("id"))
    t.commitAppend((1L to 100L).toDF("id").repartition(2))
    t.commitAppend((101L to 120L).toDF("id").repartition(1))
    val fs = hadoopFs(root)
    val snap = t.snapshot(t.latestVersion())
    assert(snap.files.length == 3)
    assert(snap.lens.length == snap.files.length,
      s"lens must align with files: ${snap.lens.length} vs ${snap.files.length}")
    snap.files.zip(snap.lens).foreach { case (rel, len) =>
      val actual = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/data/$rel")).getLen
      assert(len == actual, s"$rel: recorded $len != actual $actual")
    }
    // the append feed carries the recorded lengths too (streaming plans
    // its delta without a single filesystem call)
    val (delta, _) = t.appendDelta(1L, 2L)
    assert(delta.nonEmpty && delta.forall { case (rel, len) =>
      len == fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/data/$rel")).getLen })
    // MOR delete-key files record their lengths symmetrically, so a DML
    // plan over data + delete files is metadata-only
    t.commitDeleteByKey(Seq(5L, 7L).toDF("id"), Seq("id"))
    val mor = t.snapshot(t.latestVersion())
    assert(mor.deletes.nonEmpty && mor.deleteLens.length == mor.deletes.length)
    mor.deletes.zip(mor.deleteLens).foreach { case (rel, len) =>
      val actual = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/data/$rel")).getLen
      assert(len == actual, s"delete $rel: recorded $len != actual $actual")
    }
  }

  test("read planning trusts the manifest length: a doctored length changes the scan, a stripped one falls back") {
    val root = freshRoot("lenstrust")
    val t = new SnapshotTable(spark, root, statsCols = Seq("id"))
    t.commitAppend((1L to 50L).toDF("id").repartition(1))
    // 1. doctor the recorded length down to 10 bytes: a FRESH handle
    //    (the old one's manifest cache would mask the edit) must plan a
    //    10-byte scan — no row group's midpoint falls inside [0, 10), so
    //    the read returns no rows. Proof the split arithmetic ran off
    //    the manifest's length, not a getFileStatus
    rewriteManifest(root, 1L)(_.replaceAll(""""lens":\[\d+\]""", """"lens":[10]"""))
    val doctored = new SnapshotTable(spark, root, statsCols = Seq("id"))
    assert(doctored.read().count() == 0L,
      "a 10-byte planned length must select zero row groups")
    // 2. strip the field entirely (a pre-lens manifest): planning falls
    //    back to getFileStatus and the read is healthy again
    rewriteManifest(root, 1L)(_.replaceAll(""","lens":\[\d+\]""", ""))
    val legacy = new SnapshotTable(spark, root, statsCols = Seq("id"))
    assert(legacy.snapshot(1L).lens.isEmpty, "stripped manifest must parse as pre-lens")
    assert(legacy.read().count() == 50L)
    // 3. the next commit over the pre-lens table records lengths for the
    //    carried-forward file as well as its own (upgrade-by-commit)
    legacy.commitAppend(Seq(999L).toDF("id"))
    val up = legacy.snapshot(2L)
    assert(up.lens.length == up.files.length && up.lens.forall(_ > 0L),
      s"post-upgrade manifest must record every length: ${up.lens}")
    assert(legacy.read().count() == 51L)
  }
}
