package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The batch DSv2 WRITE path: `df.write.format("graft-snapshot")` lands
  * atomic manifest-committed versions with executor-folded stats —
  * bootstrap, append, overwrite, inline skipping-index stats, fail-fast
  * schema gate, and job-abort leaving the table untouched. */
class SnapshotWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapwrite_$tag")
    f.toFile.delete()
    f.toString
  }

  test("bootstrap + append + overwrite through df.write") {
    val root = freshRoot("modes")
    // first write bootstraps a not-yet-existing table
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graft-snapshot").mode("append").save(root)
    val t = new SnapshotTable(spark, root)
    assert(t.latestVersion() == 1L)
    assert(t.read().select("id").as[Long].collect().toSet == Set(1L, 2L))
    // second append accumulates as a new version (manifest-only on top)
    Seq((3L, "c")).toDF("id", "s")
      .write.format("graft-snapshot").mode("append").save(root)
    assert(t.latestVersion() == 2L)
    assert(t.read().count() == 3L)
    // overwrite replaces contents; history stays readable (time travel)
    Seq((9L, "z")).toDF("id", "s")
      .write.format("graft-snapshot").mode("overwrite").save(root)
    assert(t.latestVersion() == 3L)
    assert(t.read().select("id").as[Long].collect().toSet == Set(9L))
    assert(t.read(2L).count() == 3L, "overwrite must not rewrite history")
    // and the DSv2 read sees the same thing
    assert(spark.read.format("graft-snapshot").load(root)
      .select("id").as[Long].collect().toSet == Set(9L))
  }

  test("empty-partition files are dropped; an all-empty write still commits a readable version") {
    val root = freshRoot("empties")
    (1L to 3L).toDF("id").repartition(8)
      .write.format("graft-snapshot").mode("append").save(root)
    val t = new SnapshotTable(spark, root)
    val s1 = t.snapshot(1L)
    assert(s1.rows == 3L)
    assert(s1.files.length <= 3,
      s"empty task shards must not reach the manifest: ${s1.files}")
    // a fully-empty append still publishes a schema-bearing version
    (1L to 3L).toDF("id").limit(0)
      .write.format("graft-snapshot").mode("append").save(root)
    assert(t.latestVersion() == 2L)
    assert(t.snapshot(2L).rows == 3L && t.read(2L).count() == 3L)
  }

  test("appends fold per-file stats inline and carry the tip's stats columns forward") {
    val root = freshRoot("stats")
    val writer = new SnapshotTable(spark, root, statsCols = Seq("id"))
    writer.commitAppend((1L to 10L).toDF("id").repartition(1))
    // the DSv2 append resolves statsCols from the tip — no option needed
    (11L to 20L).toDF("id").repartition(1)
      .write.format("graft-snapshot").mode("append").save(root)
    val tip = writer.snapshot(writer.latestVersion())
    assert(tip.statsCols == Seq("id"),
      "a DSv2 append must not erase the skipping index")
    assert(tip.stats.head.mins.length == tip.files.length)
    // the executor-folded band for the new file is exact, not a re-scan
    val newIdx = tip.files.indices.filter(i => tip.seqs(i) == tip.version)
    assert(newIdx.map(tip.stats.head.mins) == Seq(11L))
    assert(newIdx.map(tip.stats.head.maxs) == Seq(20L))
    assert(newIdx.map(tip.stats.head.nulls) == Seq(0L))
    // and pruning works across Scala-written + DSv2-written files
    val pruned = new SnapshotTable(spark, root, statsCols = Seq("id"))
      .readRange("id", 12L, 15L, -1L)
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("id").as[Long].collect().toSet == (12L to 15L).toSet)
  }

  test("incompatible append fails fast: no version published, no data written") {
    val root = freshRoot("gate")
    Seq((1L, 5L)).toDF("id", "v")
      .write.format("graft-snapshot").mode("append").save(root)
    val t = new SnapshotTable(spark, root)
    val before = t.latestVersion()
    val dataDir = new java.io.File(s"$root/data")
    val dirsBefore = dataDir.listFiles().length
    val e = intercept[Exception] {
      Seq((2L, "not-a-long")).toDF("id", "v")
        .write.format("graft-snapshot").mode("append").save(root)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(c => Option(c.getMessage).getOrElse("")).mkString
        .contains("incompatible") ||
      e.getMessage.contains("Cannot") || e.getMessage.contains("cast"),
      s"expected a schema failure, got: $e")
    assert(t.latestVersion() == before, "failed append must publish nothing")
    assert(dataDir.listFiles().length == dirsBefore,
      "fail-fast gate must fire before any executor writes")
  }

  test("a failing write job aborts cleanly: no version, no stray commit dir") {
    val root = freshRoot("abort")
    Seq(1L, 2L).toDF("id").write.format("graft-snapshot").mode("append").save(root)
    val t = new SnapshotTable(spark, root)
    val boom = udf((x: Long) => {
      if (x == 5L) throw new RuntimeException("boom (simulated task failure)")
      x
    })
    intercept[Exception] {
      (1L to 10L).toDF("id").select(boom(col("id")).as("id"))
        .write.format("graft-snapshot").mode("append").save(root)
    }
    assert(t.latestVersion() == 1L, "aborted job must publish nothing")
    // the aborted commit dir is gone; only v1's files remain
    val dirs = new java.io.File(s"$root/data").listFiles().map(_.getName).toSet
    assert(dirs == t.snapshot(1L).files.map(_.split('/').head).toSet,
      s"abort must remove the staged commit dir: $dirs")
  }

  test("clustered writes: stats-column tables get range-distributed files with disjoint bands") {
    val root = freshRoot("clustered")
    val writer = new SnapshotTable(spark, root, statsCols = Seq("id"))
    writer.commitAppend((0L until 4L).toDF("id").repartition(1))
    // a SHUFFLED wide frame: without the write-side range distribution
    // every task would span the whole id range and no band could prune
    val shuffled = (0L until 4000L).toDF("id")
      .withColumn("r", expr("hash(id)")).repartition(8, col("r"))
      .select("id")
    // a frame this small coalesces to one range partition under AQE
    // (correct at this size); hold coalescing off so the spec observes
    // the multi-file clustered layout a real-sized write produces
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    try {
      spark.conf.set(coalesceKey, "false")
      shuffled.write.format("graft-snapshot").mode("append").save(root)
    } finally spark.conf.set(coalesceKey, prev)
    val tip = writer.snapshot(writer.latestVersion())
    val newIdx = tip.files.indices.filter(i => tip.seqs(i) == tip.version)
    assert(newIdx.length > 1, "the clustered write should produce several files")
    val bands = newIdx.map(i => (tip.stats.head.mins(i), tip.stats.head.maxs(i)))
      .sortBy(_._1)
    bands.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"clustered files must carry DISJOINT bands: $bands")
      case _ => ()
    }
    // and the skipping index actually skips: a point-range read plans
    // one of the new files, not all of them
    val pruned = new SnapshotTable(spark, root, statsCols = Seq("id"))
      .readRange("id", 2000L, 2001L, -1L)
    assert(pruned.inputFiles.length == 1, s"planned ${pruned.inputFiles.length} files")
    assert(pruned.select("id").as[Long].collect().toSet == Set(2000L, 2001L))
  }

  test("V1 streaming sink and DSv2 batch write interleave on one table") {
    val dir = freshRoot("mixed")
    val root = s"$dir/table"
    Seq(1L).toDF("id").write.format("graft-snapshot").mode("append").save(root)
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    mem.addData(2L, 3L)
    val q = mem.toDF().toDF("id").writeStream
      .format("graft-snapshot").option("path", root)
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Seq(4L).toDF("id").write.format("graft-snapshot").mode("append").save(root)
    assert(new SnapshotTable(spark, root).read()
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("count(*) / count(col) answered from the manifest: zero files read") {
    val root = freshRoot("countpush")
    val t = new SnapshotTable(spark, root, statsCols = Seq("id"))
    t.commitAppend(Seq[(java.lang.Long, Long)]((1L, 10L), (null, 20L), (3L, 30L))
      .toDF("id", "v"))
    t.commitAppend(Seq[(java.lang.Long, Long)]((4L, 40L), (5L, 50L)).toDF("id", "v"))
    def read() = spark.read.format("graft-snapshot").load(root)
    val cnt = read().groupBy().count()
    assert(cnt.collect().head.getLong(0) == 5L)
    val plan = cnt.queryExecution.executedPlan.toString
    assert(plan.contains("GraftSnapshotCountScan") && !plan.toLowerCase.contains("parquet"),
      s"count(*) must come from the manifest, not a scan:\n$plan")
    // count(col) subtracts the manifest null counts
    val cntCol = read().agg(count(col("id")))
    assert(cntCol.collect().head.getLong(0) == 4L)
    assert(cntCol.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"))
    // a MOR delete keeps count(*) manifest-served (rows are maintained)
    // but declines count(col) (null counts can't see deleted rows)
    t.commitDeleteByKey(Seq(4L).toDF("id"), Seq("id"))
    val afterDel = spark.read.format("graft-snapshot").load(root)
    val c2 = afterDel.groupBy().count()
    assert(c2.collect().head.getLong(0) == 4L)
    assert(c2.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"))
    val cc2 = afterDel.agg(count(col("id")))
    assert(cc2.collect().head.getLong(0) == 3L)
    assert(!cc2.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"),
      "count(col) under MOR deletes must fall back to the real scan")
    // filtered counts never push (the filter must be evaluated)
    val filtered = afterDel.filter(col("v") >= 30L).groupBy().count()
    assert(filtered.collect().head.getLong(0) == 2L)
    assert(!filtered.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"))
  }

  test("min/max answered from the stats bands: zero files read; deletes, nulls and non-BIGINT decline") {
    val root = freshRoot("minmaxpush")
    val t = new SnapshotTable(spark, root, statsCols = Seq("id"))
    // repartition(1): a file holding ONLY the null row would write the
    // unknown sentinel and (correctly) decline the pushdown — this test
    // wants files where min/max are known
    t.commitAppend(Seq[(java.lang.Long, Long)]((7L, 10L), (null, 20L), (3L, 30L))
      .toDF("id", "v").repartition(1))
    t.commitAppend(Seq[(java.lang.Long, Long)]((14L, 40L), (5L, 50L))
      .toDF("id", "v").repartition(1))
    def read() = spark.read.format("graft-snapshot").load(root)
    val mm = read().agg(min(col("id")), max(col("id")), count(lit(1)))
    val row = mm.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((3L, 14L, 5L)))
    val plan = mm.queryExecution.executedPlan.toString
    assert(plan.contains("GraftSnapshotCountScan") && !plan.toLowerCase.contains("parquet"),
      s"min/max on a stats column must come from the manifest bands:\n$plan")
    // v is NOT a stats column: its min/max must scan
    val mv = read().agg(max(col("v")))
    assert(mv.collect().head.getLong(0) == 50L)
    assert(!mv.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"))
    // deleting the current max row: bands can't see the removal, so the
    // aggregate must DECLINE to a real scan — and the new max is exact
    t.commitDeleteByKey(Seq(14L).toDF("id"), Seq("id"))
    val after = spark.read.format("graft-snapshot").load(root).agg(max(col("id")))
    assert(after.collect().head.getLong(0) == 7L,
      "post-delete max must be the surviving extremum, not the stale band")
    assert(!after.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"),
      "min/max under MOR deletes must fall back to the real scan")
    // an all-NULL file writes unknown sentinels: min/max decline, stay exact
    val t2 = new SnapshotTable(spark, freshRoot("minmaxnull"), statsCols = Seq("id"))
    t2.commitAppend(Seq[(java.lang.Long, Long)]((null, 1L), (null, 2L)).toDF("id", "v"))
    val root2 = t2.read().inputFiles.head.split("/data/").head.stripPrefix("file:")
    val mn = spark.read.format("graft-snapshot").load(root2).agg(min(col("id")))
    assert(mn.collect().head.isNullAt(0))
    assert(!mn.queryExecution.executedPlan.toString.contains("GraftSnapshotCountScan"))
  }

  test("manifest-exact statistics drive broadcast planning without hints") {
    val root = freshRoot("stats4cbo")
    val t = new SnapshotTable(spark, root)
    t.commitAppend((1L to 50L).toDF("id")) // small dimension
    val dim = spark.read.format("graft-snapshot").load(root)
    val fact = spark.range(0, 200000).toDF("id")
    val joined = fact.join(dim, "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 50-row snapshot dim must broadcast from its manifest stats:\n$plan")
    assert(joined.count() == 50L)
  }
}
