package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Exactly-once file ingestion (the COPY INTO shape): each source file
  * lands as one ingest version keyed by its path — the commit IS the
  * ledger, so re-runs, partial failures, and concurrent callers never
  * double-load. */
class IngestFilesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Write n single-file parquet sources under dir, keyed by offset. */
  private def sources(dir: String, offsets: Seq[Long]): Seq[String] =
    offsets.map { o =>
      val p = s"$dir/src_$o"
      (o until o + 10L).map(k => (k, s"v$k")).toDF("k", "s")
        .repartition(1).write.parquet(p)
      p
    }

  test("CALL ingest_files loads each source once; re-runs skip everything") {
    val base = freshRoot("call")
    val srcs = sources(s"$base/in", Seq(0L, 100L, 200L))
    val cat = "ging1"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$base/wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, s STRING) USING `graft-snapshot`")
    val r1 = spark.sql(
      s"CALL $cat.system.ingest_files('db.t', '$base/in/src_*/*.parquet')")
      .as[(Long, Long, Long)].head()
    assert(r1._1 == 3L && r1._2 == 0L, s"first call must ingest 3, got $r1")
    assert(spark.table(s"$cat.db.t").count() == 30L)
    // the re-run is a no-op: no new versions, no new rows
    val r2 = spark.sql(
      s"CALL $cat.system.ingest_files('db.t', '$base/in/src_*/*.parquet')")
      .as[(Long, Long, Long)].head()
    assert(r2._1 == 0L && r2._2 == 3L && r2._3 == r1._3,
      s"re-run must skip all and publish nothing, got $r2 vs $r1")
    assert(spark.table(s"$cat.db.t").count() == 30L)
    // new sources arriving later are picked up incrementally
    sources(s"$base/in", Seq(300L, 400L))
    val r3 = spark.sql(
      s"CALL $cat.system.ingest_files('db.t', '$base/in/src_*/*.parquet')")
      .as[(Long, Long, Long)].head()
    assert(r3._1 == 2L && r3._2 == 3L)
    assert(spark.table(s"$cat.db.t").count() == 50L)
  }

  test("engine ingestFileOnce: double call returns the same version, fresh=false") {
    val base = freshRoot("once")
    val Seq(src) = sources(s"$base/in", Seq(0L))
    val t = new SnapshotTable(spark, s"$base/t")
    val (v1, fresh1) = t.ingestFileOnce(src, spark.read.parquet(src))
    val (v2, fresh2) = t.ingestFileOnce(src, spark.read.parquet(src))
    assert(fresh1 && !fresh2 && v1 == v2)
    assert(t.read().count() == 10L)
    assert(t.snapshot(v1).action == "ingest" && t.snapshot(v1).txnApp == src)
  }

  test("concurrent callers racing one source: exactly one commit wins") {
    val base = freshRoot("race")
    val Seq(src) = sources(s"$base/in", Seq(0L))
    val t = new SnapshotTable(spark, s"$base/t")
    t.commitAppend(Seq((-1L, "seed")).toDF("k", "s"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Await.result(Future.sequence((1 to 4).map(_ => Future {
      new SnapshotTable(spark, s"$base/t")
        .ingestFileOnce(src, spark.read.parquet(src))
    })), 120.seconds)
    assert(attempts.count(_._2) == 1,
      s"exactly one racer must ingest, got $attempts")
    assert(attempts.map(_._1).distinct.length == 1, "all must see one version")
    assert(t.read().count() == 11L, "the source's rows land exactly once")
  }

  test("csv sources read with the TABLE schema (no inference)") {
    val base = freshRoot("csv")
    val csvDir = new java.io.File(s"$base/in"); csvDir.mkdirs()
    val f = new java.io.File(csvDir, "a.csv")
    val w = new java.io.PrintWriter(f)
    w.println("k,s"); w.println("1,x"); w.println("2,y"); w.close()
    val cat = "ging2"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$base/wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, s STRING) USING `graft-snapshot`")
    val r = spark.sql(
      s"CALL $cat.system.ingest_files('db.c', '$base/in/*.csv', 'csv')")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 1L)
    assert(spark.table(s"$cat.db.c").as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
  }

  test("json sources read with the TABLE schema (no inference)") {
    val base = freshRoot("json")
    val dir = new java.io.File(s"$base/in"); dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, "a.json"))
    w.println("""{"k": 7, "s": "j1"}"""); w.println("""{"k": 8, "s": "j2"}""")
    w.close()
    val cat = "ging3"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$base/wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.j (k BIGINT, s STRING) USING `graft-snapshot`")
    val r = spark.sql(
      s"CALL $cat.system.ingest_files('db.j', '$base/in/*.json', 'json')")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 1L)
    assert(spark.table(s"$cat.db.j").as[(Long, String)].collect().toSet ==
      Set((7L, "j1"), (8L, "j2")))
  }

  test("an empty source window reports (0, 0, tip) — idempotent re-runs") {
    val base = freshRoot("empty")
    val cat = "ging4"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$base/wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.e (k BIGINT, s STRING) USING `graft-snapshot`")
    // nothing matches: a scheduled re-run after sources are archived is
    // a normal state, not an error
    val r = spark.sql(
      s"CALL $cat.system.ingest_files('db.e', '$base/in/nothing_*/*.parquet')")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 0L && r._2 == 0L, s"empty match must be a no-op, got $r")
    // and it published NOTHING: the re-run reports the same tip
    val r2 = spark.sql(
      s"CALL $cat.system.ingest_files('db.e', '$base/in/nothing_*/*.parquet')")
      .as[(Long, Long, Long)].head()
    assert(r2 == r, s"empty no-op must not move the tip: $r -> $r2")
  }

  test("an incompatible source schema fails fast, before any write") {
    val base = freshRoot("schema")
    val t = new SnapshotTable(spark, s"$base/t")
    t.commitAppend(Seq((1L, "a")).toDF("k", "s"))
    val bad = s"$base/bad"
    Seq(("oops", 1L)).toDF("k", "s2").write.parquet(bad) // k: STRING clash
    intercept[IllegalArgumentException](
      t.ingestFileOnce(bad, spark.read.parquet(bad)))
    assert(t.read().count() == 1L)
  }
}
