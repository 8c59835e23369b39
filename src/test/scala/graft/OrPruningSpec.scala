package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNull, LessThan, Or, StringContains}
import graft.sources.{GraftSnapshotScan, GraftSnapshotScanBuilder, SnapshotBatch, SnapshotTable}

/** Disjunctive (OR) file pruning: the lane conjunctive bands cannot
  * serve. `k < a OR k > b` derives no conjunctive band (the hull covers
  * every file), but per-branch alternatives plan only the edge files —
  * through both the engine's readRanges and the DSv2 pushFilters path.
  * Soundness edges pinned: an underivable branch drops the whole OR
  * (never mis-prunes), non-stats columns make an alternative
  * unverifiable (admits everything), IN branches keep per-key bloom
  * precision, IS NULL branches admit only null-carrying files, and the
  * residual predicate always re-applies so results equal the unpruned
  * filter exactly. */
class OrPruningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_orprune_$tag")
    f.toFile.delete()
    f.toString
  }

  /** Three key-clustered files: [0,99], [100,199], [200,299]. */
  private def threeBands(root: String): SnapshotTable = {
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    Seq(0L, 100L, 200L).foreach { base =>
      t.commitAppend((base until base + 100L).map(k => (k, k * 2))
        .toDF("k", "v").repartition(1))
    }
    t
  }

  private def planned(t: SnapshotTable, fs: org.apache.spark.sql.sources.Filter*)
      : Seq[String] = {
    val b = new GraftSnapshotScanBuilder(spark, t, t.latestVersion(),
      t.read().schema)
    b.pushFilters(fs.toArray)
    b.build().asInstanceOf[GraftSnapshotScan].plannedFiles
  }

  test("readRanges plans only the overlapping files and equals the unpruned filter") {
    val t = threeBands(freshRoot("ranges"))
    val pruned = t.readRanges("k", Seq((Long.MinValue, 50L), (250L, Long.MaxValue)))
    assert(pruned.inputFiles.length == 2,
      s"union [*,50]∪[250,*] must plan the two edge files, got ${pruned.inputFiles.length}")
    val expect = t.read().filter(col("k") <= 50 || col("k") >= 250)
      .select("k").as[Long].collect().toSet
    assert(pruned.select("k").as[Long].collect().toSet == expect)
    // a range landing only in the middle file plans exactly that file
    assert(t.readRanges("k", Seq((150L, 160L))).inputFiles.length == 1)
    // disjoint from every band: zero files, empty result
    assert(t.readRanges("k", Seq((500L, 600L))).count() == 0L)
  }

  test("DSv2: OR of two range branches prunes to the edge files; result matches") {
    val root = freshRoot("dsv2")
    val t = threeBands(root)
    val or = Or(LessThan("k", 50L), GreaterThan("k", 250L))
    assert(planned(t, or).length == 2,
      "k < 50 OR k > 250 must plan the two edge files")
    // the derivation itself: two alternatives, one per branch
    val alts = SnapshotBatch.orAltsOf(Seq(or), bandsV = 2)
    assert(alts.length == 1 && alts.head.length == 2)
    // end-to-end through the connector (Spark pushes the OR itself)
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") < 50 || col("k") > 250)
    assert(df.select("k").as[Long].collect().toSet ==
      ((0L to 49L) ++ (251L to 299L)).toSet)
  }

  test("an underivable branch drops the whole OR: nothing is mis-pruned") {
    val t = threeBands(freshRoot("underivable"))
    // StringContains derives no band: the OR could match rows anywhere
    val or = Or(LessThan("k", 50L), StringContains("s", "x"))
    assert(SnapshotBatch.orAltsOf(Seq(or), bandsV = 2).isEmpty)
    assert(planned(t, or).length == 3, "underivable OR must plan every file")
  }

  test("a branch on a non-stats column is unverifiable and admits every file") {
    val root = freshRoot("nonstats")
    val t = threeBands(root)
    // v is a real column but not a stats column: the alternative derives
    // but cannot be checked against any band — the OR must plan all files
    val or = Or(LessThan("k", 50L), EqualTo("v", 480L))
    assert(planned(t, or).length == 3)
    // and the result is still exact (residual re-applies)
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") < 50 || col("v") === 480L)
    assert(df.select("k").as[Long].collect().toSet ==
      ((0L to 49L).toSet + 240L))
  }

  test("And-inside-Or: each branch's own conjuncts bound it") {
    val t = threeBands(freshRoot("andinor"))
    // (k >= 120 AND k < 130) OR (k >= 220 AND k < 230): middle + last file
    val or = Or(
      And(GreaterThanOrEqual("k", 120L), LessThan("k", 130L)),
      And(GreaterThanOrEqual("k", 220L), LessThan("k", 230L)))
    assert(planned(t, or).length == 2)
    // composes with a conjunctive band by intersection: k <= 199 keeps
    // only the middle file of the two
    assert(planned(t, or, LessThan("k", 200L)).length == 1)
  }

  test("IN branches expand to per-key alternatives with bloom precision") {
    val root = freshRoot("inbloom")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.setTableProperties(Map("write.bloom.cols" -> "k"))
    // two files over the SAME key range, disjoint key sets (evens/odds):
    // bands alone cannot separate them, blooms can
    t.commitAppend((0L until 200L by 2).map(k => (k, k)).toDF("k", "v").repartition(1))
    t.commitAppend((1L until 200L by 2).map(k => (k, k)).toDF("k", "v").repartition(1))
    // both keys even: the odd file's blooms reject every alternative
    val orEven = Or(EqualTo("k", 10L), In("k", Array[Any](40L, 80L)))
    assert(planned(t, orEven).length == 1,
      "even-key OR must prune the odd file via per-key blooms")
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") === 10L || col("k").isin(40L, 80L))
    assert(df.select("k").as[Long].collect().toSet == Set(10L, 40L, 80L))
  }

  test("IS NULL branches admit only null-carrying files") {
    val root = freshRoot("isnull")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    t.commitAppend(Seq[(java.lang.Long, Long)]((1L, 10L), (2L, 20L))
      .toDF("k", "v").repartition(1))
    t.commitAppend(Seq[(java.lang.Long, Long)]((null, 30L), (9L, 40L))
      .toDF("k", "v").repartition(1))
    // k > 100 matches nothing; k IS NULL lives only in the second file
    val or = Or(GreaterThan("k", 100L), IsNull("k"))
    assert(planned(t, or).length == 1,
      "only the null-carrying file can satisfy k > 100 OR k IS NULL")
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") > 100L || col("k").isNull)
    assert(df.select("v").as[Long].collect().toSet == Set(30L))
  }

  test("copy-on-write UPDATE with an OR predicate rewrites only the edge files") {
    val cat = "gorup"
    val wh = freshRoot("cowupdate")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='k')")
    Seq(0L, 100L, 200L).foreach(b => spark.sql(
      s"INSERT INTO $cat.db.t SELECT id AS k, id * 2 AS v FROM range($b, ${b + 100})"))
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    val before = t.snapshot(t.latestVersion())
    spark.sql(s"UPDATE $cat.db.t SET v = v + 1 WHERE k < 50 OR k >= 250")
    val after = t.snapshot(t.latestVersion())
    // the middle file (k in [100,199]) matches neither branch: re-listed
    // BY IDENTITY; only the two edge files were rewritten
    val kept = after.files.filter(before.files.contains)
    assert(kept.length >= 1 && after.files.length > kept.length,
      s"middle file must survive by identity: before=${before.files.length} " +
        s"after=${after.files.length} kept=${kept.length}")
    val got = spark.table(s"$cat.db.t").select("k", "v")
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == 21L && got(150L) == 300L && got(260L) == 521L)
  }

  test("OR pruning through a MOR delete still applies the delete") {
    val root = freshRoot("mor")
    val t = threeBands(root)
    t.commitDeleteByKey(Seq(10L, 260L).toDF("k"), Seq("k"))
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("k") < 20 || col("k") >= 280)
    assert(df.select("k").as[Long].collect().toSet ==
      (((0L to 19L).toSet - 10L) ++ (280L to 299L).toSet))
  }
}
