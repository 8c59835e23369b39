package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import graft.sources.{GraftSnapshotScan, SnapshotTable}

/** Per-file NDV sketches in the manifest (mergeable datasketches HLL
  * over band keys — Iceberg's puffin-ndv idea): distinct-count
  * estimates served from metadata alone within the HLL error envelope
  * (small bias even at low counts — estimates, never claimed exact),
  * merged across any file subset so pruned scans report post-pruning
  * NDV — and surfaced through DSv2 column statistics into the CBO
  * stats path. */
class NdvSketchSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def freshRoot(tag: String): String = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_ndv_$tag")
    f.toFile.delete()
    f.toString
  }

  test("uniform keys: estimate within the HLL error envelope vs exact") {
    val t = new SnapshotTable(spark, freshRoot("uniform"), statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 20000).toDF("k").repartition(4))
    val est = t.estimateDistinct("k")
    assert(est.isDefined, "sketches must be recorded by the driver write path")
    val e = est.get.toDouble
    // lgK=9 -> RSE ~4.6%; 3 sigma ~14% — allow 20% for a fixed seed
    assert(math.abs(e - 20000.0) / 20000.0 < 0.20,
      s"estimate $e too far from exact 20000")
  }

  test("skewed keys: low-cardinality estimates stay within a tight envelope") {
    val t = new SnapshotTable(spark, freshRoot("skew"), statsCols = Seq("k"))
    t.commitAppend(spark.range(0, 50000).select((col("id") % 100).as("k"))
      .repartition(4))
    val est = t.estimateDistinct("k")
    assert(est.exists(n => n >= 90L && n <= 110L), s"got $est for exact 100")
  }

  test("union across files counts shared keys once") {
    val t = new SnapshotTable(spark, freshRoot("union"), statsCols = Seq("k"))
    // two files over OVERLAPPING ranges: [0,300) and [200,500) -> 500
    t.commitAppend(spark.range(0, 300).toDF("k").repartition(1))
    t.commitAppend(spark.range(200, 500).toDF("k").repartition(1))
    val est = t.estimateDistinct("k")
    assert(est.exists(n => n >= 450L && n <= 550L),
      s"union must count shared keys once: got $est for exact 500")
  }

  test("DSv2 executor writes fold sketches inline; pruned scans report post-pruning NDV") {
    val wh = freshRoot("dsv2")
    val cat = "gndv"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='k')")
    Seq(0L, 1000L, 2000L).foreach { base =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT id AS k, id * 3 AS v " +
        s"FROM range($base, ${base + 300})")
    }
    val t = new SnapshotTable(spark, s"$wh/db/t", Seq("k"))
    val full = t.estimateDistinct("k")
    assert(full.exists(n => math.abs(n - 900.0) / 900.0 < 0.20), s"got $full")
    def scanOf(df: DataFrame): GraftSnapshotScan =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation
            if r.scan.isInstanceOf[V1ScanWrapper] =>
          r.scan.asInstanceOf[V1ScanWrapper].v1Scan
            .asInstanceOf[GraftSnapshotScan]
      }.getOrElse(fail("no snapshot scan in plan"))
    // full scan: column stats carry ~900 distinct
    val fullScan = scanOf(spark.table(s"$cat.db.t"))
    val fullCs = fullScan.estimateStatistics().columnStats()
    assert(fullCs.size() == 1, s"got $fullCs")
    val fullNdv = fullCs.values().iterator().next().distinctCount().getAsLong
    assert(math.abs(fullNdv - 900.0) / 900.0 < 0.20, s"got $fullNdv")
    // band-pruned scan: the reported NDV shrinks to the planned subset
    val pruned = scanOf(spark.sql(
      s"SELECT k FROM $cat.db.t WHERE k BETWEEN 0 AND 299"))
    val prunedNdv = pruned.estimateStatistics().columnStats()
      .values().iterator().next().distinctCount().getAsLong
    assert(prunedNdv < 500L && prunedNdv > 200L,
      s"post-pruning NDV must reflect the planned files, got $prunedNdv")
  }

  test("the CBO stats path consumes the connector's distinct counts") {
    val wh = freshRoot("cbo")
    val cat = "gndvc"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='k')")
    spark.sql(s"INSERT INTO $cat.db.c SELECT id % 50 AS k, id AS v " +
      "FROM range(0, 5000)")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(s"$cat.db.c").queryExecution.optimizedPlan.stats
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.distinctCount.exists(n =>
          n.toLong >= 45L && n.toLong <= 55L)),
        s"logical plan stats must carry the manifest NDV, got $stats")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // the SQL surface: CALL estimate_distinct answers from one manifest
    // parse (zero files opened)
    val row = spark.sql(s"CALL $cat.system.estimate_distinct('db.c', 'k')")
      .as[(String, Option[Long], Long)].head()
    assert(row._1 == "k" && row._3 == 5000L &&
      row._2.exists(n => n >= 45L && n <= 55L), s"got $row")
    // a non-stats column answers NULL, never a guess
    val none = spark.sql(s"CALL $cat.system.estimate_distinct('db.c', 'v')")
      .as[(String, Option[Long], Long)].head()
    assert(none._2.isEmpty, s"got $none")
  }

  test("grouped-vs-inline differential: sketches survive the group encoding") {
    // tiny thresholds force the file list into GROUP files; a second
    // handle with default thresholds reads the same chain inline-style
    val root = freshRoot("grouped")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"),
      groupInlineFold = 2, groupMergeAt = 3)
    (0 until 6).foreach(i => t.commitAppend(
      spark.range(i * 50L, i * 50L + 50L).toDF("k").repartition(1)))
    assert(t.snapshot(t.latestVersion()).groupRefs.nonEmpty,
      "construction must actually exercise the group encoding")
    def near300(o: Option[Long]): Boolean = o.exists(n => n >= 270L && n <= 330L)
    assert(near300(t.estimateDistinct("k")), s"got ${t.estimateDistinct("k")}")
    val plain = new SnapshotTable(spark, root, Seq("k"))
    assert(near300(plain.estimateDistinct("k")),
      "a default-threshold handle must read the grouped sketches identically")
  }

  test("sketches survive the manifest round-trip and compaction") {
    val root = freshRoot("chain")
    val t = new SnapshotTable(spark, root, statsCols = Seq("k"))
    (0 until 3).foreach(i => t.commitAppend(
      spark.range(i * 100L, i * 100L + 100L).toDF("k").repartition(1)))
    def near300(o: Option[Long]): Boolean = o.exists(n => n >= 270L && n <= 330L)
    assert(near300(t.estimateDistinct("k")), s"got ${t.estimateDistinct("k")}")
    // a fresh handle re-reads everything from the manifest chain
    val t2 = new SnapshotTable(spark, root, Seq("k"))
    assert(near300(t2.estimateDistinct("k")))
    t.compact(1000000L)
    assert(near300(t.estimateDistinct("k")),
      "compaction rewrites files; the new files carry fresh sketches")
  }
}
