package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sync.DimSync

/** FIXTURES.md §7 fixture: a value new to the dim (insert path), a dim value
  * absent from source (delete path), combination rows whose names miss a dim
  * (inner-merge drop), blue-green promote with rollback. */
class DimSyncSpec extends SparkSpec {
  import spark.implicits._

  test("insertMissing / deleteStale are the two anti-join directions (J6/J7)") {
    val source = Seq("tv", "radio", "print", null).toDF("channel")
    val dim = Seq((1, "tv"), (2, "online")).toDF("id", "name")
    val ins = DimSync.insertMissing(source, "channel", dim).as[String].collect().toSet
    assert(ins == Set("radio", "print")) // null filtered, 'tv' exists
    val del = DimSync.deleteStale(dim, source, "channel").collect()
    assert(del.map(_.getAs[String]("name")).toSet == Set("online"))
  }

  test("resolveCombinations inner-merges names to ids, drops unmatched (A2/J5/A4)") {
    val main = Seq(
      ("2024-01-01", "tv", "pub1"), ("2024-01-01", "tv", "pub1"), // dup combo
      ("2024-01-02", "radio", "pub2"),                            // 'radio' not in dim
      ("2024-01-03", "tv", "pub2")
    ).toDF("date", "channel", "publisher")
    val out = DimSync.resolveCombinations(main, Seq("date", "channel", "publisher"), Map(
      "channel" -> Seq((10L, "tv"), (11L, "online")).toDF("id", "name"),
      "publisher" -> Seq((20L, "pub1"), (21L, "pub2")).toDF("id", "name")))
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("date", "channel_id", "publisher_id"))
    assert(rows.length == 2) // dup collapsed, radio row dropped
  }

  test("cdcDiff emits I/U/D with null-safe change detection, drops unchanged keys") {
    val oldSnap = Seq(
      (1L, Some("a"), Some(10)),  // unchanged — must not appear
      (2L, Some("b"), Some(20)),  // value change on v2
      (3L, Some("c"), None),      // null → value counts as change
      (4L, Some("d"), Some(40))   // deleted
    ).toDF("k", "v1", "v2")
    val newSnap = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), Some(99)),
      (3L, Some("c"), Some(30)),
      (5L, Some("e"), Option.empty[Int]) // inserted (with a null attr)
    ).toDF("k", "v1", "v2")
    val out = DimSync.cdcDiff(oldSnap, newSnap, "k", Seq("v1", "v2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (2L, "U", "v2"), (3L, "U", "v2"), (4L, "D", ""), (5L, "I", "")))
  }

  test("promote applies staging and rolls back on failed validation (C5)") {
    val dir = Files.createTempDirectory("graft_promote").toString
    val prod = s"$dir/prod"; val stage = s"$dir/stage"; val backup = s"$dir/backup"
    Seq((1, "old")).toDF("id", "v").write.parquet(prod)
    Seq((2, "new")).toDF("id", "v").write.parquet(stage)

    // failing validation -> production restored
    assert(!DimSync.promote(spark, stage, prod, backup, _ => false))
    assert(spark.read.parquet(prod).as[(Int, String)].collect().toSet == Set(1 -> "old"))

    // passing validation -> staging promoted
    assert(DimSync.promote(spark, stage, prod, backup, df => df.count() == 1))
    assert(spark.read.parquet(prod).as[(Int, String)].collect().toSet == Set(2 -> "new"))
  }

  test("scd2Apply covers change/delete/insert/unchanged, and an identical re-apply is a no-op") {
    val history = Seq(
      (1L, 10.0, 0L, Option.empty[Long]),  // unchanged
      (2L, 20.0, 0L, Option.empty[Long]),  // will change to 25.0
      (3L, 30.0, 0L, Option.empty[Long]),  // deleted upstream
      (4L, 5.0, 0L, Some(50L)),            // already closed: pass-through
      (4L, 6.0, 50L, Option.empty[Long])   // current version of key 4, unchanged
    ).toDF("k", "bal", "valid_from", "valid_to")
    val snapshot = Seq((1L, 10.0), (2L, 25.0), (4L, 6.0), (9L, 99.0))
      .toDF("k", "bal")
    val once = DimSync.scd2Apply(history, snapshot, Seq("k"), Seq("bal"), asOf = 100L)
    val got = once.as[(Long, Double, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10.0, 0L, None),        // unchanged stays open
      (2L, 20.0, 0L, Some(100L)),  // old version closed
      (2L, 25.0, 100L, None),      // new version opened
      (3L, 30.0, 0L, Some(100L)),  // deleted: closed, no new version
      (4L, 5.0, 0L, Some(50L)),    // historical row untouched
      (4L, 6.0, 50L, None),        // current version unchanged
      (9L, 99.0, 100L, None)       // brand-new key
    ), s"got $got")
    // idempotence: folding the SAME snapshot again changes nothing
    val twice = DimSync.scd2Apply(once, snapshot, Seq("k"), Seq("bal"), asOf = 200L)
    assert(twice.as[(Long, Double, Long, Option[Long])].collect().toSet == got)
  }

  test("scd2Apply: NULL attr transitions count as changes; NULL valid_from rows are not dropped") {
    val history = Seq(
      (1L, Option(10.0), Option(0L), Option.empty[Long]),       // value -> NULL: change
      (2L, Option.empty[Double], Option(0L), Option.empty[Long]), // NULL -> value: change
      (3L, Option.empty[Double], Option(0L), Option.empty[Long]), // NULL -> NULL: unchanged
      (4L, Option(4.0), Option.empty[Long], Option.empty[Long])   // open row with NULL valid_from: must survive
    ).toDF("k", "bal", "valid_from", "valid_to")
    val snapshot = Seq(
      (1L, Option.empty[Double]), (2L, Option(2.0)), (3L, Option.empty[Double]),
      (4L, Option(4.0))).toDF("k", "bal")
    val got = DimSync.scd2Apply(history, snapshot, Seq("k"), Seq("bal"), asOf = 9L)
      .as[(Long, Option[Double], Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some(10.0), Some(0L), Some(9L)), (1L, None, Some(9L), None),
      (2L, None, Some(0L), Some(9L)), (2L, Some(2.0), Some(9L), None),
      (3L, None, Some(0L), None),
      (4L, Some(4.0), None, None)  // unchanged open row, NULL valid_from intact
    ), s"got $got")
  }

  test("checksumCompare: identical tables are in_sync on every bucket; any row edit/delete flips only its buckets") {
    val base = (1L to 200L).map(i => (i, s"name_$i", s"grp_${i % 5}"))
      .toDF("id", "name", "grp")
    val same = DimSync.checksumCompare(base, base, Seq("id", "name", "grp"), buckets = 8)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(same.length == 8 && same.forall(_._6), s"got ${same.mkString(",")}")
    assert(same.map(_._2).sum == 200L) // counts partition the table

    val perturbed = base.filter($"id" =!= 7L) // one delete
      .withColumn("name", when($"id" === 13L, lit("EDITED")).otherwise($"name"))
    val diff = DimSync.checksumCompare(base, perturbed, Seq("id", "name", "grp"), buckets = 8)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val bad = diff.filter(!_._6)
    // exactly the buckets of rows 7 (delete) and 13 (old+new hash) mismatch
    assert(bad.nonEmpty && bad.length <= 3, s"got ${diff.mkString(",")}")
    assert(diff.map(_._2).sum == 200L && diff.map(_._3).sum == 199L)
  }
}
