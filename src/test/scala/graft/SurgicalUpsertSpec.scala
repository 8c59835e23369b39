package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** File-surgical MERGE INTO + the rewrite-restricted change feed: a
  * key-clustered table's upsert rewrites only the files whose stats
  * bands overlap the batch's key box, and the CDF of that commit reads
  * only the removed/added files — the O(changed) CoW path (the full
  * exceptAll diff stays pinned for tables where nothing is provable). */
class SurgicalUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_surg_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Three band-disjoint files over id ∈ [1,10], [11,20], [21,30]. */
  private def threeFiles(t: SnapshotTable): Unit =
    Seq(1L, 11L, 21L).foreach { lo =>
      t.commitAppend(spark.range(lo, lo + 10).toDF("id")
        .withColumn("v", col("id") * 10L).withColumn("w", lit(1L))
        .repartition(1))
    }

  test("surgical upsert rewrites ONLY the band-overlapping file; the rest carry by name") {
    val t = new SnapshotTable(spark, freshRoot("carry"), statsCols = Seq("id"))
    threeFiles(t)
    val before = t.snapshot(t.latestVersion())
    val v = t.commitUpsert(
      Seq((15L, 999L, 2L), (31L, 310L, 2L)).toDF("id", "v", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    val snap = t.snapshot(v)
    assert(snap.action == "upsert")
    // files [1,10] and [21,30] carried by NAME with their sequences
    val carried = before.files.toSet.intersect(snap.files.toSet)
    assert(carried.size == 2,
      s"two band-disjoint files must carry, got ${carried.size}")
    val keptSeqs = snap.files.zip(snap.seqs).filter(p => carried(p._1)).map(_._2)
    val origSeqs = before.files.zip(before.seqs).filter(p => carried(p._1)).map(_._2)
    assert(keptSeqs.sorted == origSeqs.sorted,
      "carried files must keep their original commit sequences")
    // semantics identical to the full merge: 15 updated, 31 inserted
    val out = t.read(v).select("id", "v").as[(Long, Long)].collect().toMap
    assert(out.size == 31 && out(15L) == 999L && out(31L) == 310L &&
      out(14L) == 140L && out(25L) == 250L)
    assert(snap.rows == 31L)
  }

  test("the CDF of a surgical upsert reads only the changed files (no full-table diff)") {
    val t = new SnapshotTable(spark, freshRoot("cdf"), statsCols = Seq("id"))
    threeFiles(t)
    val before = t.snapshot(t.latestVersion())
    val v = t.commitUpsert(Seq((15L, 999L, 2L)).toDF("id", "v", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    val feed = t.readChangeFeed(v - 1, v)
    // plan evidence: none of the carried files appear in the feed's
    // scan (entries are `uuid/name.parquet` tails of absolute paths)
    val untouched = before.files.toSet.intersect(t.snapshot(v).files.toSet)
    val scanned = feed.inputFiles.toSet
    assert(scanned.nonEmpty && untouched.size == 2)
    assert(!scanned.exists(p => untouched.exists(p.endsWith)),
      s"CDF must not open carried files: $scanned")
    // value evidence: exactly one retraction + one insert for key 15
    val rows = feed.select(col("_change_type"), col("id"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(("delete", 15L, 150L), ("insert", 15L, 999L)),
      s"got $rows")
  }

  test("insert-only upsert (keys outside every band) carries ALL files") {
    val t = new SnapshotTable(spark, freshRoot("insonly"), statsCols = Seq("id"))
    threeFiles(t)
    val before = t.snapshot(t.latestVersion())
    val v = t.commitUpsert(Seq((40L, 400L, 2L)).toDF("id", "v", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    val snap = t.snapshot(v)
    assert(before.files.toSet.subsetOf(snap.files.toSet),
      "no band overlaps: every file must carry")
    assert(snap.rows == 31L && t.read(v).count() == 31L)
    val feed = t.readChangeFeed(v - 1, v)
    assert(feed.select("_change_type", "id").as[(String, Long)].collect().toSet ==
      Set(("insert", 40L)))
  }

  test("pinned fallback: a stats-less table still full-rewrites (and full-diffs)") {
    val t = new SnapshotTable(spark, freshRoot("fallback")) // no stats cols
    threeFiles(t)
    val before = t.snapshot(t.latestVersion())
    val v = t.commitUpsert(Seq((15L, 999L, 2L)).toDF("id", "v", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    val snap = t.snapshot(v)
    assert(before.files.toSet.intersect(snap.files.toSet).isEmpty,
      "without stats nothing is provable: the old full rewrite is pinned")
    // values identical either way
    val out = t.read(v).select("id", "v").as[(Long, Long)].collect().toMap
    assert(out.size == 30 && out(15L) == 999L)
    val rows = t.readChangeFeed(v - 1, v)
      .filter(col("id") === 15L)
      .select("_change_type", "v").as[(String, Long)].collect().toSet
    assert(rows == Set(("delete", 150L), ("insert", 999L)))
  }

  test("surgical upsert through MOR deletes: carried deletes keep applying; rewrite materializes its own") {
    val t = new SnapshotTable(spark, freshRoot("mor"), statsCols = Seq("id"))
    threeFiles(t)
    // MOR-delete one key in the untouched band and one in the rewritten band
    t.commitDeleteByKey(Seq(5L, 25L).toDF("id"), Seq("id"))
    val v = t.commitUpsert(Seq((21L, 2100L, 2L)).toDF("id", "v", "w"),
      uniqueKey = Seq("id"), watermarkCol = "w")
    val out = t.read(v).select("id", "v").as[(Long, Long)].collect().toMap
    // 5 still deleted (carried delete file applies to the carried file);
    // 25 stays deleted (materialized by the rewrite); 21 updated
    assert(!out.contains(5L) && !out.contains(25L) && out(21L) == 2100L,
      s"got ${out.toSeq.sortBy(_._1)}")
    assert(out.size == 28 && t.snapshot(v).rows == 28L)
    // the delete file is still listed (it governs carried files)
    assert(t.snapshot(v).deletes.nonEmpty)
  }
}
