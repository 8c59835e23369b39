package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.sources.SnapshotTable

/** Streaming admission control over snapshot tables — the option that
  * makes a 100 TB bootstrap survivable: without a read limit, a stream
  * starting at version 1 of a large table plans the ENTIRE backlog as
  * one micro-batch (one giant stage, one giant sink commit).
  * `maxRowsPerTrigger` / `maxVersionsPerTrigger` translate to version
  * offsets via scalar manifest summaries; versions are the atomic
  * delivery unit (an over-cap commit delivers alone and whole); both
  * the V1 path source and the DSv2 catalog stream share the walk. */
class SnapshotRateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_ratelimit_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Drain via AvailableNow, recording (rows per non-empty batch). */
  private def drainBatches(root: String, ckpt: String,
                           options: Map[String, String]): Seq[Long] = {
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = options.foldLeft(spark.readStream.format("graft-snapshot")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(root)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) => {
        val n = batch.count()
        if (n > 0) sizes += n
        ()
      })
      .start()
    q.awaitTermination()
    sizes.toSeq
  }

  test("maxRowsPerTrigger splits a backlog drain into bounded batches") {
    val dir = freshRoot("rows")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    (0 until 5).foreach(k =>
      t.commitAppend(((k * 10) until (k * 10 + 10)).map(_.toLong).toDF("id")))

    val sizes = drainBatches(root, s"$dir/ckpt",
      Map("maxRowsPerTrigger" -> "10"))
    assert(sizes.sum == 50L, "every row delivered exactly once")
    assert(sizes == Seq(10L, 10L, 10L, 10L, 10L),
      s"10-row cap over 10-row commits = one version per batch, got $sizes")
  }

  test("maxVersionsPerTrigger caps commits per batch") {
    val dir = freshRoot("versions")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    (0 until 5).foreach(k => t.commitAppend(Seq(k.toLong).toDF("id")))

    val sizes = drainBatches(root, s"$dir/ckpt",
      Map("maxVersionsPerTrigger" -> "2"))
    assert(sizes.sum == 5L)
    assert(sizes == Seq(2L, 2L, 1L),
      s"5 single-row commits at 2 versions per batch, got $sizes")
  }

  test("an over-cap commit delivers alone and whole (progress contract)") {
    val dir = freshRoot("overcap")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    t.commitAppend((0L until 3L).toDF("id"))
    t.commitAppend((100L until 200L).toDF("id")) // 100 rows, cap is 10
    t.commitAppend((3L until 6L).toDF("id"))

    val sizes = drainBatches(root, s"$dir/ckpt",
      Map("maxRowsPerTrigger" -> "10"))
    assert(sizes == Seq(3L, 100L, 3L),
      s"versions are atomic: the 100-row commit may not split or merge, got $sizes")
  }

  test("maintenance versions cost no admission budget; restart resumes under the cap") {
    val dir = freshRoot("resume")
    val root = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val t = new SnapshotTable(spark, root)
    (0 until 3).foreach(k =>
      t.commitAppend(((k * 5) until (k * 5 + 5)).map(_.toLong).toDF("id")))
    t.compact(targetRowsPerFile = 1000L) // dataChange=false: zero delta rows

    val first = drainBatches(root, ckpt, Map("maxRowsPerTrigger" -> "10"))
    // 5+5 fits one 10-cap batch; the third commit and the compaction
    // (zero rows) ride the second
    assert(first.sum == 15L && first.forall(_ <= 10L), s"got $first")

    // the SAME checkpoint resumes at the consumed version — no re-delivery
    (3 until 5).foreach(k =>
      t.commitAppend(((k * 5) until (k * 5 + 5)).map(_.toLong).toDF("id")))
    val second = drainBatches(root, ckpt, Map("maxRowsPerTrigger" -> "10"))
    assert(second.sum == 10L && second.forall(_ <= 10L), s"got $second")
  }

  test("maxBytesPerTrigger splits the drain on manifest-recorded lengths") {
    val dir = freshRoot("bytes")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    (0 until 4).foreach(k =>
      t.commitAppend(((k * 10) until (k * 10 + 10)).map(_.toLong).toDF("id")))
    // every 10-row commit writes a similar-sized parquet file; a cap of
    // one commit's bytes admits exactly one version per batch (admission
    // charges the manifest-recorded lengths, which equal the on-disk ones)
    val perCommitBytes = t.snapshot(1L).files
      .map(f => new java.io.File(s"$root/data/$f").length()).sum
    assert(perCommitBytes > 0)

    val sizes = drainBatches(root, s"$dir/ckpt",
      Map("maxBytesPerTrigger" -> perCommitBytes.toString))
    assert(sizes.sum == 40L)
    assert(sizes == Seq(10L, 10L, 10L, 10L),
      s"a one-commit byte budget admits one version per batch, got $sizes")

    // both caps together: bytes for two commits but rows for one —
    // the tighter cap wins
    val sizes2 = drainBatches(root, s"$dir/ckpt2",
      Map("maxBytesPerTrigger" -> (2 * perCommitBytes).toString,
        "maxRowsPerTrigger" -> "10"))
    assert(sizes2 == Seq(10L, 10L, 10L, 10L), s"got $sizes2")
  }

  test("uncapped drain is unchanged: the whole backlog in one batch") {
    val dir = freshRoot("uncapped")
    val root = s"$dir/table"
    val t = new SnapshotTable(spark, root)
    (0 until 4).foreach(k => t.commitAppend(Seq(k.toLong).toDF("id")))
    val sizes = drainBatches(root, s"$dir/ckpt", Map.empty)
    assert(sizes == Seq(4L), s"got $sizes")
  }

  test("DSv2 catalog stream honors the same options") {
    val cat = "graftratecat"
    val wh = java.nio.file.Files.createTempDirectory("graft_rate_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.rl (id BIGINT) USING `graft-snapshot`")
    (0 until 4).foreach(k => spark.sql(
      s"INSERT INTO $cat.db.rl SELECT id FROM range(${k * 10}, ${k * 10 + 10})"))

    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream
      .option("maxRowsPerTrigger", "10")
      .table(s"$cat.db.rl")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_rate_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) => {
        val n = batch.count()
        if (n > 0) sizes += n
        ()
      })
      .start()
    q.awaitTermination()
    assert(sizes.sum == 40L, "every row delivered exactly once")
    assert(sizes.toSeq == Seq(10L, 10L, 10L, 10L),
      s"10-row cap over 10-row inserts = one version per batch, got ${sizes.toSeq}")
  }
}
