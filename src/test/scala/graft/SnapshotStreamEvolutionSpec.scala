package graft

import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{SnapshotSource, SnapshotTable}

/** Schema FOLLOWING on the V1 streaming source. Two regimes, both
  * pinned here:
  *  - WITHIN a run the stream keeps its start-time schema: delta files
  *    that evolved additively deliver with new columns pruned, files
  *    predating a pinned column null-fill it, and an incompatible
  *    change (stale narrow pin over widened files) stays LOUD;
  *  - a RESTART re-resolves the source schema from the tip manifest, so
  *    the evolved schema is adopted without operator intervention (old
  *    files null-fill added columns / upcast widened ones natively). */
class SnapshotStreamEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_snapevo_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Drain the table's stream once with AvailableNow via foreachBatch,
    * collecting every delivered row as (columns, rows). */
  private def drain(root: String, ckpt: String): (Seq[String], Seq[Seq[Any]]) = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        cols.synchronized {
          cols += df.columns.toSeq
          df.collect().foreach(r => rows += r.toSeq)
        }
        ()
      }.start()
    q.awaitTermination()
    (cols.flatten.distinct.toSeq, rows.toSeq)
  }

  /** A batch produced by a RUNNING source pinned at `pinned` schema,
    * collected as plain rows. */
  private def midRunBatch(root: String, pinned: org.apache.spark.sql.types.StructType,
                          from: Long, to: Long): Seq[Seq[Any]] = {
    val src = new SnapshotSource(spark, root, pinned)
    val df = src.getBatch(Some(LongOffset(from)), LongOffset(to))
    // un-flag the streaming leaves so the batch runner will execute it
    val batchPlan = df.queryExecution.analyzed.transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.copy(isStreaming = false)
    }
    bridge.ofRows(spark, batchPlan).collect().toSeq.map(_.toSeq)
  }

  test("mid-run additive evolution: new files deliver projected to the pinned schema") {
    val root = freshRoot("add")
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq((1L, "a")).toDF("id", "s"))
    val pinned = t.read().schema // the running query's start-time schema
    t.commitAppend(Seq((2L, "b", 99L)).toDF("id", "s", "extra")) // evolves mid-run
    assert(midRunBatch(root, pinned, 1L, 2L) == Seq(Seq(2L, "b")),
      "the evolved file must DELIVER, new column pruned by the pin")
  }

  test("restart adopts the evolved schema; the old file null-fills the added column") {
    val dir = freshRoot("restart")
    val root = s"$dir/t"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq((1L, "a")).toDF("id", "s"))
    val (c1, r1) = drain(root, s"$dir/ckpt")
    assert(c1 == Seq("id", "s") && r1 == Seq(Seq(1L, "a")))
    t.commitAppend(Seq((2L, "b", 99L)).toDF("id", "s", "extra"))
    // same checkpoint, new run: the source re-resolves the tip schema
    val (c2, r2) = drain(root, s"$dir/ckpt")
    assert(c2 == Seq("id", "s", "extra") && r2 == Seq(Seq(2L, "b", 99L)),
      "a restart follows the evolved schema (offsets resume, schema refreshes)")
  }

  test("pinned column missing from delta files: null-fills instead of failing") {
    val dir = freshRoot("missing")
    val root = s"$dir/t"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq((1L, "a", 7L)).toDF("id", "s", "v"))
    // a later append legitimately omits v (evolution keeps it on the
    // table; the batch's files just don't carry it)
    t.commitAppend(Seq((2L, "b")).toDF("id", "s"))
    val (cols, rows) = drain(root, s"$dir/ckpt")
    assert(cols == Seq("id", "s", "v"))
    assert(rows.toSet == Set(Seq(1L, "a", 7L), Seq(2L, "b", null)),
      "files without the pinned column must null-fill it")
  }

  test("mid-run incompatible widening is LOUD; restart adopts the widened schema") {
    val dir = freshRoot("widen")
    val root = s"$dir/t"
    val t = new SnapshotTable(spark, root)
    t.commitAppend(Seq(1).toDF("id")) // INT schema
    val intPin = t.read().schema
    t.commitAppend(Seq(java.lang.Long.MAX_VALUE - 1).toDF("id")) // widens to LONG
    val e = intercept[Exception](midRunBatch(root, intPin, 1L, 2L))
    def msgs(x: Throwable): String =
      if (x == null) "" else x.toString + msgs(x.getCause)
    assert(msgs(e).toLowerCase.matches("(?s).*(parquet|schema|type|int).*"),
      s"a stale int pin over long files must fail loudly, got: $e")
    // a restart resolves the widened LONG schema; the INT32 file
    // upcasts natively
    val (_, rows) = drain(root, s"$dir/ckpt")
    assert(rows.toSet == Set(Seq(1L), Seq(java.lang.Long.MAX_VALUE - 1)))
  }
}
