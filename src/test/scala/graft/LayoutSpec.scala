package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (known Morton codes), is monotone in each coordinate's bits") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (7L, 0L), (0L, 7L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue2($"x", $"y")).as[Long].collect().toSeq
    // interleave(x,y): x bits at even positions, y at odd
    assert(got == Seq(0L, 1L, 2L, 3L, 0x15L, 0x2aL, 0x1bL))
  }

  test("zValueN matches zValue2 at n=2 and round-trips bits at n=3") {
    val rng = new scala.util.Random(11)
    val pairs = (1 to 200).map(_ => (rng.nextLong().abs & 0x3FFFFFFFL,
      rng.nextLong().abs & 0x3FFFFFFFL))
    val df = pairs.toDF("x", "y")
    val mismatch = df.select(
      (Layout.zValueN(Seq($"x", $"y")) =!= Layout.zValue2($"x", $"y")).as("m"))
      .filter($"m").count()
    assert(mismatch == 0)
    // n=3: de-interleave recovers each coordinate's low 20 bits
    val triples = (1 to 100).map(_ => (rng.nextInt(1 << 20).toLong,
      rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong))
    val z = triples.toDF("a", "b", "c")
      .select($"a", $"b", $"c", Layout.zValueN(Seq($"a", $"b", $"c")).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    def unshuffle(z: Long, j: Int): Long =
      (0 until 20).map(i => ((z >> (i * 3 + j)) & 1L) << i).reduce(_ | _)
    z.foreach { case (a, b, c, zv) =>
      assert(unshuffle(zv, 0) == a && unshuffle(zv, 1) == b && unshuffle(zv, 2) == c,
        s"bad interleave for ($a,$b,$c) -> $zv")
    }
  }

  test("z-ordered layout skips most row groups for a 2-d box filter; linear layout cannot") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    // 40k points on a 200x200 grid, in (x-major) linear order — the
    // layout where a filter on y alone prunes nothing
    val data = spark.range(40000).select(
      (col("id") / 200).cast("long").as("x"),
      (col("id") % 200).cast("long").as("y"))
    Layout.writeZOrdered(data, s"$dir/z", "x", "y", numFiles = 64)
    data.orderBy("x").repartitionByRange(64, col("x")).write.parquet(s"$dir/linear")

    def rowsScanned(path: String, filter: org.apache.spark.sql.Column,
                    expectRows: Int): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path).filter(filter)
        // execute THIS plan (count() would build and execute a different
        // one, leaving these metrics untouched)
        assert(q.collect().length == expectRows) // correctness first
        q.queryExecution.executedPlan.collectLeaves()
          .collectFirst { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
          .getOrElse(fail("no FileSourceScanExec found"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // 2-d box: the z layout reads a small fraction (each file covers a
    // tight rectangle)
    val box = $"x" >= 20 && $"x" < 40 && $"y" >= 20 && $"y" < 40
    val zBox = rowsScanned(s"$dir/z", box, 400)
    assert(zBox < 40000 / 4, s"z-order scanned $zBox of 40000 rows for the box")
    // y-only stripe: the x-sorted layout CANNOT prune it (every file
    // holds all y values), the z layout can — this is the comparative
    // claim, stated on the filter where the layouts genuinely differ
    // (an x-filter prunes equally well on both, so comparing there is
    // a file-boundary coin flip)
    val stripe = $"y" >= 20 && $"y" < 40
    val zStripe = rowsScanned(s"$dir/z", stripe, 4000)
    val linearStripe = rowsScanned(s"$dir/linear", stripe, 4000)
    assert(linearStripe == 40000, s"x-sorted layout unexpectedly pruned y: $linearStripe")
    assert(zStripe * 2 < linearStripe,
      s"z-order did not prune the y stripe: z=$zStripe linear=$linearStripe")
  }

  test("snapshot-table Z-order compact: per-file bands prune on EVERY clustering column") {
    val dir = Files.createTempDirectory("graft_snap_zorder").toString
    val root = s"$dir/t"
    val t = new graft.sources.SnapshotTable(spark, root,
      statsCols = Seq("x", "y"))
    // 3 shuffled appends: every file's (x, y) bands start full-range
    val df = spark.range(30000).select(
      (col("id") * 2654435761L % 128).as("x"),
      (col("id") * 40503L % 128).as("y"),
      col("id").as("v"))
    (0 until 3).foreach(k =>
      t.commitAppend(df.filter(col("id") % 3 === k).repartition(4)))
    def planned(c: String, lo: Long, hi: Long): Int =
      t.readRange(c, lo, hi, -1L).inputFiles.length
    val total0 = t.read().inputFiles.length
    assert(planned("x", 10, 20) == total0 && planned("y", 10, 20) == total0,
      "precondition: shuffled layout prunes nothing")

    val v = t.compact(30000L / 16, Seq("x", "y"))
    assert(t.snapshot(v).action == "compact")
    val total = t.read().inputFiles.length
    assert(total >= 8, s"expected ~16 z-files, got $total")
    // selective filters on EITHER column prune files off the manifest
    val px = planned("x", 10, 20)
    val py = planned("y", 10, 20)
    assert(px * 2 < total, s"x-range read $px of $total files")
    assert(py * 2 < total, s"y-range read $py of $total files")
    // and the rewrite is content-identical
    assert(t.read().agg(sum(col("v"))).head.getLong(0) ==
      df.agg(sum(col("v"))).head.getLong(0))
    assert(t.read(v).count() == 30000L)

    // SQL surface: comma-separated cluster_by Z-orders through CALL
    val cat = "graftzcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.zt (x BIGINT, y BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('stats_cols'='x,y')")
    spark.sql(s"INSERT INTO $cat.db.zt " +
      "SELECT id * 7 % 64 AS x, id * 13 % 64 AS y FROM range(0, 4000)")
    val v2 = spark.sql(
      s"CALL $cat.system.compact('db.zt', 500, 'x,y')").head.getLong(0)
    val zt = new graft.sources.SnapshotTable(spark, s"$dir/db/zt",
      statsCols = Seq("x", "y"))
    assert(zt.latestVersion() == v2)
    val ztTotal = zt.read().inputFiles.length
    assert(zt.readRange("y", 2, 9, -1L).inputFiles.length < ztTotal,
      "CALL compact with a column list must Z-order, not range-sort on x only")
  }
}
