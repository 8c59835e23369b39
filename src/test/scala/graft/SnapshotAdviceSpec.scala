package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{HadoopAtomicLogStore, ConditionalPutLogStore, SnapshotTable}

/** Round-12 review fixes, each pinned by the anomaly it closes:
  * (txnApp, batchId) epoch dedup (fan-in / fresh-checkpoint data loss),
  * torn-manifest cleanup on post-create write failure (self-collision
  * masking), legacy unnamed-stats misattribution (wrong-column pruning),
  * streaming-sink stats carry-forward (silent skipping-index erasure),
  * and relation-time version pinning (non-repeatable batch reads). */
class SnapshotAdviceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapadv_$tag")
    f.toFile.delete()
    f.toString
  }

  test("epoch dedup keys on (txnApp, batchId): two queries' epoch 0 both land; same pair replays") {
    val t = new SnapshotTable(spark, freshRoot("txnpair"))
    // two writers fanning into one table, both at epoch 0 — batchId-only
    // dedup would silently skip the second commit (the data-loss anomaly)
    val vA = t.commitAppendOnce("queryA", 0L, Seq(1L).toDF("id"))
    val vB = t.commitAppendOnce("queryB", 0L, Seq(2L).toDF("id"))
    assert(vA == 1L && vB == 2L, "distinct txnApps at the same epoch are distinct commits")
    assert(t.read().select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a genuine replay (same pair) returns the existing version
    assert(t.commitAppendOnce("queryA", 0L, Seq(1L).toDF("id")) == vA)
    assert(t.latestVersion() == 2L)
    // interleaved epochs: the backward walk stops at the same txnApp's
    // older epoch, not at another writer's
    val vA1 = t.commitAppendOnce("queryA", 1L, Seq(3L).toDF("id"))
    assert(t.commitAppendOnce("queryB", 0L, Seq(99L).toDF("id")) == vB,
      "queryB's epoch-0 replay must find its own commit past queryA's newer one")
    assert(t.commitAppendOnce("queryA", 1L, Seq(99L).toDF("id")) == vA1)
    assert(t.read().count() == 3L)
  }

  test("streaming fan-in: two queries with fresh checkpoints both deliver (no epoch-0 collision)") {
    val dir = freshRoot("fanin")
    val root = s"$dir/table"
    implicit val ctx = spark.sqlContext
    def drain(mem: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long],
              ckpt: String): Unit = {
      val q = mem.toDF().toDF("id").writeStream
        .format("graft-snapshot").option("path", root)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val m1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val m2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    m1.addData(1L, 2L)
    drain(m1, s"$dir/ckpt1")
    m2.addData(10L, 20L) // separate query, separate checkpoint: epochs restart at 0
    drain(m2, s"$dir/ckpt2")
    val t = new SnapshotTable(spark, root)
    assert(t.read().select("id").as[Long].collect().toSet == Set(1L, 2L, 10L, 20L),
      "the second query's epoch-0 batch must not be misread as a replay")
    // the manifests record distinct query identities for the same epoch
    val appends = t.history().filter(_.batchId == 0L)
    assert(appends.map(_.txnApp).distinct.length == 2,
      s"two queries at epoch 0 must carry two txnApps: ${appends.map(_.txnApp)}")
    // and a RESTART of query 1 on its own checkpoint commits nothing new
    val tip = t.latestVersion()
    drain(m1, s"$dir/ckpt1")
    assert(t.latestVersion() == tip)
  }

  test("LogStore: a post-create write failure removes the partial file before rethrowing") {
    val root = freshRoot("tornclean")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    // a FileSystem whose create succeeds but whose stream fails on write —
    // the disk-full shape: the exclusive CREATE won the version, then the
    // body never landed
    val failing = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        super.create(f, overwrite).close() // the real exclusive create lands
        new org.apache.hadoop.fs.FSDataOutputStream(new java.io.OutputStream {
          override def write(b: Int): Unit =
            throw new java.io.IOException("No space left on device (simulated)")
        }, null)
      }
    }
    for (store <- Seq(HadoopAtomicLogStore, ConditionalPutLogStore)) {
      val p = new org.apache.hadoop.fs.Path(root, s"v_${store.getClass.getSimpleName}")
      val e = intercept[java.io.IOException](
        store.writeExclusive(failing, p, "body".getBytes("UTF-8")))
      assert(e.getMessage.contains("No space left"), s"$store must rethrow the cause: $e")
      assert(!fs.exists(p),
        s"$store left a torn file at $p — the committers would misread it as a " +
          "rival's manifest and the torn tip would poison every subsequent read")
    }
  }

  test("legacy unnamed stats: honored only for a single-stats-column handle, never misattributed") {
    val root = freshRoot("legacystats")
    val writer = new SnapshotTable(spark, root, statsCols = Seq("a"))
    // two files with ANTI-correlated columns: a ascending, b descending —
    // attributing a's bands to b would prune exactly the wrong files
    writer.commitAppend(Seq((1L, 110L), (10L, 100L)).toDF("a", "b").repartition(1))
    writer.commitAppend(Seq((11L, 60L), (20L, 50L)).toDF("a", "b").repartition(1))
    // doctor the tip manifest into the LEGACY shape: same stats block,
    // no statsCols key (what a pre-multi-column writer published)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tipPath = new org.apache.hadoop.fs.Path(s"$root/_snapshots/v${"%020d".format(2)}.json")
    val in = fs.open(tipPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val legacy = txt.replace(""","statsCols":["a"]""", "")
    assert(legacy != txt, "the doctoring must have removed the statsCols key")
    fs.delete(tipPath, false)
    val out = fs.create(tipPath, false)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()

    // a single-stats-column handle still prunes on the unnamed block
    val one = new SnapshotTable(spark, root, statsCols = Seq("a"))
    val pruned = one.readRange("a", 1L, 10L, -1L)
    assert(pruned.inputFiles.length == 1, "legacy stats still prune for the 1-col handle")
    assert(pruned.select("a").as[Long].collect().toSet == Set(1L, 10L))

    // a multi-column handle whose FIRST column differs must NOT attribute
    // the unnamed block: pruning on b with a's bands would plan ZERO
    // files for b∈[50,60] (a-bands are [1,10] and [11,20]) — silently
    // empty, the wrong-results anomaly. Unknown stats read everything.
    val two = new SnapshotTable(spark, root, statsCols = Seq("b", "a"))
    val byB = two.readRange("b", 50L, 60L, -1L)
    assert(byB.select("a").as[Long].collect().toSet == Set(11L, 20L),
      "legacy stats must read as unknown (never pruned) for a multi-col handle")
  }

  test("streaming sink carries the tip's stats columns forward onto appended manifests") {
    val dir = freshRoot("sinkstats")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root, statsCols = Seq("id"))
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    mem.addData(3L, 4L)
    val q = mem.toDF().toDF("id").writeStream
      .format("graft-snapshot").option("path", root)
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tip = t.snapshot(t.latestVersion())
    assert(tip.action == "append" && tip.batchId == 0L)
    assert(tip.statsCols == Seq("id"),
      "a micro-batch append must not erase the table's data-skipping index")
    assert(tip.stats.nonEmpty && tip.stats.head.mins.length == tip.files.length,
      "the appended manifest must carry aligned per-file stats")
    // and pruning still works across old + streamed files
    val skipping = new SnapshotTable(spark, root, statsCols = Seq("id"))
    assert(skipping.readRange("id", 3L, 4L, -1L)
      .select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("DSv2 batch read pins its version at relation creation (repeatable read)") {
    val root = freshRoot("pinned")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    val df = spark.read.format("graft-snapshot").load(root)
    assert(df.count() == 2L)
    t.commitAppend(Seq(3L).toDF("id")) // concurrent commit after relation creation
    assert(df.count() == 2L,
      "a re-executed DataFrame must read the snapshot it was created against")
    assert(df.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a FRESH relation resolves the new tip
    assert(spark.read.format("graft-snapshot").load(root).count() == 3L)
  }
}
