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

  test("z-ordered layout skips most row groups for a 2-d box filter; linear layout cannot") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    // 40k points on a 200x200 grid, in (x-major) linear order — the
    // layout where a filter on y alone prunes nothing
    val data = spark.range(40000).select(
      (col("id") / 200).cast("long").as("x"),
      (col("id") % 200).cast("long").as("y"))
    Layout.writeZOrdered(data, s"$dir/z", "x", "y", numFiles = 64)
    data.orderBy("x").repartitionByRange(64, col("x")).write.parquet(s"$dir/linear")

    def rowsScanned(path: String): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path)
          .filter($"x" >= 20 && $"x" < 40 && $"y" >= 20 && $"y" < 40)
        // execute THIS plan (count() would build and execute a different
        // one, leaving these metrics untouched)
        assert(q.collect().length == 400) // correctness first: 20x20 box
        q.queryExecution.executedPlan.collectLeaves()
          .collectFirst { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
          .getOrElse(fail("no FileSourceScanExec found"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val zRows = rowsScanned(s"$dir/z")
    val linearRows = rowsScanned(s"$dir/linear")
    // the z layout should read a small fraction; the x-sorted layout
    // reads everything matching x (all y values for those x's) at best
    assert(zRows < linearRows,
      s"z-order did not prune better: z=$zRows linear=$linearRows")
    assert(zRows < 40000 / 4, s"z-order scanned $zRows of 40000 rows")
  }
}
