package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.SnapshotTable

/** Structured Streaming source over the snapshot format: version-exact
  * offsets, O(delta) micro-batches, dataChange-aware maintenance
  * invisibility, checkpointed restart resume. */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapstream_$tag")
    f.toFile.delete()
    f.toString
  }

  private def drain(root: String, ckpt: String, name: String,
                    skipChanges: Boolean = false): Set[Long] = {
    val got = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.format("graft-snapshot")
      .option("skipChangeCommits", skipChanges.toString).load(root)
      .writeStream.queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        { got ++= batch.select("id").as[Long].collect(); () })
      .start()
    q.awaitTermination()
    got.toSet
  }

  test("delivers each committed version exactly once; restart resumes at the offset") {
    val dir = freshRoot("resume")
    val root = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    t.commitAppend(Seq(3L).toDF("id"))
    assert(drain(root, ckpt, "snap_feed_1") == Set(1L, 2L, 3L))
    // nothing new: a fresh AvailableNow pass on the same checkpoint is empty
    assert(drain(root, ckpt, "snap_feed_2").isEmpty)
    // new commits resume from the checkpointed version — no re-delivery
    t.commitAppend(Seq(4L, 5L).toDF("id"))
    assert(drain(root, ckpt, "snap_feed_3") == Set(4L, 5L))
  }

  test("compaction is invisible; non-append changes fail loudly unless skipped") {
    val dir = freshRoot("maint")
    val root = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L, 2L, 3L).toDF("id"))
    assert(drain(root, ckpt, "snap_maint_1") == Set(1L, 2L, 3L))
    // pure maintenance delivers nothing and raises nothing
    t.compact(targetRowsPerFile = 100L)
    assert(drain(root, ckpt, "snap_maint_2").isEmpty)
    // a row-level delete breaks the insert-only contract: fail loudly...
    t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(root, ckpt, "snap_maint_3"))
    assert(err.getMessage.contains("non-append data change") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append data change")))
    // ...unless the user opts into appends-only; a later overwrite's
    // rewritten files must NOT replay old rows as new under the skip.
    // (An AvailableNow run that RECOVERS a previously-failed batch stops
    // at that batch — engine semantics — so drain twice and union.)
    t.commitAppend(Seq(9L).toDF("id"))
    assert(drain(root, ckpt, "snap_maint_4", skipChanges = true) ++
      drain(root, ckpt, "snap_maint_4b", skipChanges = true) == Set(9L))
    t.commitOverwrite(Seq(50L, 51L).toDF("id"))
    t.commitAppend(Seq(60L).toDF("id"))
    assert(drain(root, ckpt, "snap_maint_5", skipChanges = true) == Set(60L))
  }

  test("changeFeed mode streams retractions; a replica applying them converges to the tip") {
    val dir = freshRoot("cdfmode")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    t.commitDeleteByKey(Seq(2L).toDF("id"), Seq("id"))
    t.compact(targetRowsPerFile = 100L)
    // driver-side replica multiset, maintained by applying each batch's
    // changes in version order — the CDF replication contract
    val replica = scala.collection.mutable.Map[(Long, String), Int]().withDefaultValue(0)
    def drainCdf(ckpt: String): Seq[(Long, String, String, Long)] = {
      val seen = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      val q = spark.readStream.format("graft-snapshot")
        .option("changeFeed", "true").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val rows = b.select("id", "s", "_change_type", "_commit_version")
            .as[(Long, String, String, Long)].collect().sortBy(_._4)
          rows.foreach { case (id, s, tpe, _) =>
            replica((id, s)) += (if (tpe == "insert") 1 else -1) }
          seen ++= rows; ()
        }).start()
      q.awaitTermination()
      seen.toSeq
    }
    val first = drainCdf(s"$dir/ckpt")
    assert(first.toSet == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L), (2L, "b", "delete", 2L))) // compaction absent
    // more commits, including a rewrite; resume delivers only their changes
    t.commitAppend(Seq((2L, "B")).toDF("id", "s"))
    t.commitDelete(col("id") === 3L) // copy-on-write → exceptAll-derived
    val second = drainCdf(s"$dir/ckpt")
    assert(second.toSet == Set((2L, "B", "insert", 4L), (3L, "c", "delete", 5L)))
    val replicaSet = replica.collect { case (k, n) if n > 0 => k }.toSet
    assert(replicaSet == t.read().select("id", "s").as[(Long, String)].collect().toSet)
  }

  test("startingVersion bootstraps a fresh consumer past history (incl. vacuumed prefixes)") {
    val dir = freshRoot("startv")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    t.commitAppend(Seq(2L).toDF("id"))
    // numeric: stream from v2 onward only
    val got = scala.collection.mutable.Set[Long]()
    def drainFrom(sv: String, ckpt: String): Set[Long] = {
      got.clear()
      val q = spark.readStream.format("graft-snapshot")
        .option("startingVersion", sv).load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          { got ++= b.select("id").as[Long].collect(); () }).start()
      q.awaitTermination(); got.toSet
    }
    assert(drainFrom("2", s"$dir/ckptA") == Set(2L))
    // "latest": from-now-on — nothing yet, then only post-subscription commits
    assert(drainFrom("latest", s"$dir/ckptB").isEmpty)
    t.commitAppend(Seq(3L).toDF("id"))
    assert(drainFrom("3", s"$dir/ckptC") == Set(3L))
    // vacuumed table: v1/v2 manifests gone; a fresh consumer bootstraps
    // from the tip read + streams from latest without touching history
    t.vacuum(keepLast = 1)
    assert(t.read().count() == 3L)
    assert(drainFrom("latest", s"$dir/ckptD").isEmpty)
    t.commitAppend(Seq(4L).toDF("id"))
    assert(drainFrom("4", s"$dir/ckptE") == Set(4L))
  }

  test("startingVersion=latest is resolved once per checkpoint: commits during downtime are NOT skipped") {
    val dir = freshRoot("latestonce")
    val root = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1L).toDF("id"))
    def drainLatest(name: String): Set[Long] = {
      val got = scala.collection.mutable.Set[Long]()
      val q = spark.readStream.format("graft-snapshot")
        .option("startingVersion", "latest").load(root)
        .writeStream.queryName(name).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          { got ++= b.select("id").as[Long].collect(); () }).start()
      q.awaitTermination(); got.toSet
    }
    assert(drainLatest("latest_1").isEmpty) // resolved to from-now-on, persisted
    // the query is DOWN while v2/v3 commit; a restart that re-resolved
    // "latest" would floor past them and silently drop the rows
    t.commitAppend(Seq(2L).toDF("id"))
    t.commitAppend(Seq(3L).toDF("id"))
    assert(drainLatest("latest_2") == Set(2L, 3L))
  }

  test("feed composes with streaming transforms and lands in a downstream snapshot table") {
    val dir = freshRoot("loop")
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    val t = new SnapshotTable(spark, src)
    t.commitAppend(spark.range(0L, 100L).toDF("id"))
    t.commitAppend(spark.range(100L, 200L).toDF("id"))
    val out = new SnapshotTable(spark, dst)
    // table → stream → filter/project → epoch-idempotent table commit:
    // the full lakehouse loop, one engine
    val q = spark.readStream.format("graft-snapshot").load(src)
      .filter(col("id") % 2 === 0).select(col("id"), (col("id") * 10).as("v"))
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        { out.commitAppendOnce(epoch, batch); () })
      .start()
    q.awaitTermination()
    assert(out.read().count() == 100L)
    assert(out.read().agg(sum("v")).head.getLong(0) ==
      (0L until 200L by 2).map(_ * 10).sum)
  }
}
