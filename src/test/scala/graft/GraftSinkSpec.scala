package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** The DSv2 WRITE connector contract: staged-file commit (nothing
  * visible before BatchWrite.commit), abort discards, manifest-gated
  * reads, append/overwrite semantics, full-type round trip, and read
  * column pruning. */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"

  private val hostile = "comma,quote\"newline\nbase64?~tilde ünïcødé"

  private def sample = Seq(
    (1L, Option("plain"), Option(1.5), Option(true),
      Option(Timestamp.valueOf("2024-01-01 10:00:00"))),
    (2L, Option(hostile), Option(-0.0), Option(false), None),
    (3L, Option(""), None, None, Option(Timestamp.valueOf("1999-12-31 23:59:59"))),
    (4L, None, Option(Double.MaxValue), Option(true), None)
  ).toDF("id", "s", "d", "b", "t")

  test("append round-trips every supported type, nulls, empty and hostile strings") {
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    val back = spark.read.format("graft-sink").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSet == sample.collect().toSet)
    // empty string and null are distinct after the round trip
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getString(1) == "" && byId(4L).isNullAt(1))
  }

  test("second append unions; overwrite (truncate) replaces and deletes superseded files") {
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    sample.withColumn("id", col("id") + 100L)
      .write.format("graft-sink").mode("append").save(dir)
    assert(spark.read.format("graft-sink").load(dir).count() == 8)
    val repl = Seq((9L, Option("only"), Option(0.5), Option(true),
      Option(Timestamp.valueOf("2024-06-01 00:00:00"))))
      .toDF("id", "s", "d", "b", "t")
    repl.write.format("graft-sink").mode("overwrite").save(dir)
    val back = spark.read.format("graft-sink").load(dir)
    assert(back.count() == 1 && back.head.getLong(0) == 9L)
    // superseded data files are physically gone (manifest drove the delete)
    val dataFiles = new java.io.File(dir, "data").listFiles()
    assert(dataFiles != null && dataFiles.length > 0 && dataFiles.length <= 2,
      s"old files not cleaned: ${dataFiles.map(_.getName).mkString(",")}")
  }

  test("a failing job aborts: previous contents untouched, no staging residue") {
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    val before = spark.read.format("graft-sink").load(dir).collect().toSet
    val boom = sample.withColumn("d",
      udf((id: Long) => if (id >= 3L) throw new RuntimeException("boom") else 0.5)
        .apply(col("id")))
    intercept[Exception] {
      boom.write.format("graft-sink").mode("append").save(dir)
    }
    assert(spark.read.format("graft-sink").load(dir).collect().toSet == before,
      "aborted write leaked rows into the visible table")
    val residue = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_staging"))
    assert(residue.isEmpty, s"staging residue: ${residue.map(_.getName).mkString(",")}")
  }

  test("reads are manifest-gated: a stray file in data/ is invisible") {
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    // simulate a crashed job's half-moved file
    val stray = new java.io.File(dir, "data/stray-file")
    java.nio.file.Files.write(stray.toPath, "999,~,~,~,~\n".getBytes("UTF-8"))
    assert(spark.read.format("graft-sink").load(dir).count() == 4,
      "reader listed the directory instead of the manifest")
  }

  test("read-side column pruning reaches the scan") {
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    val q = spark.read.format("graft-sink").load(dir).select($"id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("cols=id"), s"pruning did not reach the scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("streaming write: connector-to-connector pipeline is exactly-once across restart") {
    val dir = newDir()
    val ck = java.nio.file.Files.createTempDirectory("graft_sink_ck").toString
    def run(rows: Long): Unit = {
      val q = spark.readStream.format("graft-events")
        .option("rows", rows).option("partitions", 2).option("batchRows", 250)
        .load()
        .writeStream.format("graft-sink")
        .option("path", dir).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive, "stream did not drain")
    }
    run(600)
    val mid = spark.read.format("graft-sink").load(dir)
    assert(mid.count() == 600)
    // multiple epochs actually committed (not one catch-all batch)
    val files = graft.sources.v2.GraftSink.readManifest(dir).get._2
    assert(files.map(_.split("-")(1)).distinct.size >= 2,
      s"expected several epochs in the manifest, got: $files")
    // the feed grows; restart resumes from the checkpoint: delta only
    run(1000)
    val back = spark.read.format("graft-sink").load(dir)
    assert(back.count() == 1000, "resume duplicated or dropped rows")
    assert(back.select($"event_id").distinct().count() == 1000)
    val batchTwin = spark.read.format("graft-events").option("rows", 1000).load()
    assert(back.selectExpr("sum(event_id)", "sum(user_id)").head() ==
      batchTwin.selectExpr("sum(event_id)", "sum(user_id)").head())
  }

  test("streaming commit is idempotent per epoch (re-delivered batch appends nothing)") {
    import org.apache.hadoop.fs.Path
    val dir = newDir()
    sample.write.format("graft-sink").mode("append").save(dir)
    val schema = spark.read.format("graft-sink").load(dir).schema
    val w = new graft.sources.v2.GraftSinkStreamingWrite(dir, schema, truncate = false)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stage(): Unit = {
      val staged = new Path(new Path(dir, "_staging_e7"), "part-0-0")
      fs.mkdirs(staged.getParent)
      val out = fs.create(staged, true)
      out.write("1,~,~,~,~\n".getBytes("UTF-8")); out.close()
    }
    stage()
    w.commit(7L, Array(graft.sources.v2.GraftSinkCommitMessage("part-0-0", 1L)))
    val afterFirst = graft.sources.v2.GraftSink.readManifest(dir).get._2
    assert(afterFirst.exists(_.startsWith("data/epoch-7-")))
    // engine re-delivers epoch 7 after a failure post-commit: restaged
    // files must be dropped, the manifest unchanged
    stage()
    w.commit(7L, Array(graft.sources.v2.GraftSinkCommitMessage("part-0-0", 1L)))
    assert(graft.sources.v2.GraftSink.readManifest(dir).get._2 == afterFirst)
    assert(!fs.exists(new Path(dir, "_staging_e7")), "restage not cleaned up")
  }
}
