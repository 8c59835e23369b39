package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.SnapshotTable

/** Zero-rewrite type widening: `ALTER COLUMN TYPE <wider>` is a
  * schema-only commit — the new version re-lists the same files under
  * the widened schema and the parquet readers upcast the narrower
  * stored values. Pinned: file identity across the DDL, value
  * equivalence, time travel below the DDL reading the narrow type,
  * stats-band skipping surviving the widen (integral band keys are the
  * long value for every width), narrowing refusal, the MOR
  * delete-key guard, and the widened integral-rank lattice on the
  * append-time evolution path. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_widen_$tag")
    f.toFile.delete()
    f.toString
  }

  test("int -> long: zero files rewritten, values intact, time travel reads narrow") {
    val t = new SnapshotTable(spark, freshRoot("intlong"), statsCols = Seq("k"))
    t.commitAppend((1 to 100).map(i => (i, s"r$i")).toDF("k", "s"))
    val narrowV = t.latestVersion()
    val before = t.snapshot(narrowV)
    assert(t.read().schema("k").dataType == IntegerType)
    val v = t.commitWidenColumn("k", LongType)
    val after = t.snapshot(v)
    assert(after.action == "alter" && !after.dataChange,
      "widen must be a schema-only, non-data-change commit")
    assert(after.files == before.files, "widen must rewrite zero files")
    assert(t.read().schema("k").dataType == LongType)
    assert(t.read().select("k").as[Long].collect().sorted.toSeq ==
      (1L to 100L))
    // time travel below the DDL reads the narrow type
    assert(t.read(narrowV).schema("k").dataType == IntegerType)
    // appends after the widen land long values beyond int range
    t.commitAppend(Seq((5000000000L, "big")).toDF("k", "s"))
    assert(t.read().filter(col("s") === "big").select("k")
      .as[Long].head() == 5000000000L)
  }

  test("stats-band skipping survives the widen (same key space)") {
    val t = new SnapshotTable(spark, freshRoot("bands"), statsCols = Seq("k"))
    Seq(0, 100, 200).foreach(b => t.commitAppend(
      (b until b + 100).map(i => (i, i)).toDF("k", "v").repartition(1)))
    assert(t.readRange("k", 120L, 150L, -1L).inputFiles.length == 1)
    t.commitWidenColumn("k", LongType)
    val pruned = t.readRange("k", 120L, 150L, -1L)
    assert(pruned.inputFiles.length == 1,
      "bands recorded for INT files must keep pruning under the LONG schema")
    assert(pruned.select("k").as[Long].collect().sorted.toSeq == (120L to 150L))
  }

  test("float -> double and the integral rank lattice") {
    val t = new SnapshotTable(spark, freshRoot("lattice"))
    t.commitAppend(Seq((1.toByte, 1.5f)).toDF("b", "f"))
    assert(t.read().schema("b").dataType == ByteType)
    t.commitWidenColumn("b", ShortType)
    t.commitWidenColumn("b", LongType) // short -> long skips a rank: fine
    t.commitWidenColumn("f", DoubleType)
    val r = t.read().select("b", "f").as[(Long, Double)].head()
    assert(r == ((1L, 1.5)))
  }

  test("narrowing, reshaping, unknown columns, and same-type all refuse") {
    val t = new SnapshotTable(spark, freshRoot("refuse"), statsCols = Seq("k"))
    t.commitAppend(Seq((1L, "a")).toDF("k", "s"))
    intercept[IllegalArgumentException](t.commitWidenColumn("k", IntegerType))
    intercept[IllegalArgumentException](t.commitWidenColumn("s", LongType))
    intercept[IllegalArgumentException](t.commitWidenColumn("nope", LongType))
    intercept[IllegalArgumentException](t.commitWidenColumn("k", LongType))
  }

  test("the MOR delete-key column refuses until compact absorbs the deletes") {
    val t = new SnapshotTable(spark, freshRoot("morkey"))
    t.commitAppend((1 to 10).map(i => (i, i)).toDF("k", "v"))
    t.commitDeleteByKey(Seq(3).toDF("k"), Seq("k"))
    val e = intercept[IllegalArgumentException](t.commitWidenColumn("k", LongType))
    assert(e.getMessage.contains("delete key"))
    t.compact(1000000L) // absorbs the equality deletes into data files
    t.commitWidenColumn("k", LongType)
    assert(t.read().select("k").as[Long].collect().toSet ==
      ((1L to 10L).toSet - 3L))
  }

  test("append-time widening now covers byte/short (the same lattice)") {
    val t = new SnapshotTable(spark, freshRoot("evolve"))
    t.commitAppend(Seq(1.toByte).toDF("k"))
    t.commitAppend(Seq(1000.toShort).toDF("k")) // byte table + short batch
    assert(t.read().schema("k").dataType == ShortType)
    t.commitAppend(Seq(70000).toDF("k"))
    assert(t.read().schema("k").dataType == IntegerType)
    assert(t.read().select("k").as[Int].collect().toSet == Set(1, 1000, 70000))
  }

  test("SQL surface: ALTER TABLE ALTER COLUMN TYPE BIGINT, then insert beyond int") {
    val wh = freshRoot("sqlwh")
    spark.conf.set("spark.sql.catalog.gwid", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwid.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwid.db")
    spark.sql("CREATE TABLE gwid.db.w (k INT, s STRING) USING `graft-snapshot`")
    spark.sql("INSERT INTO gwid.db.w VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gwid.db.w ALTER COLUMN k TYPE BIGINT")
    spark.sql("INSERT INTO gwid.db.w VALUES (5000000000, 'c')")
    assert(spark.sql("SELECT sum(k) FROM gwid.db.w").as[Long].head() ==
      5000000003L)
    // narrowing refuses through SQL too — Spark's own analyzer rejects
    // non-upcast column type changes (NOT_SUPPORTED_CHANGE_COLUMN)
    // before the catalog ever sees them; the engine guard stays as the
    // path-API backstop (pinned in the narrowing-refusal test above)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gwid.db.w ALTER COLUMN k TYPE INT"))
    assert(e.getMessage.toLowerCase.contains("not a widening") ||
      e.getMessage.toLowerCase.contains("narrowing") ||
      e.getMessage.toLowerCase.contains("not_supported_change_column"))
  }
}
