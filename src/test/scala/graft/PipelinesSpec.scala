package graft

import java.nio.file.Files
import graft.pipeline.Pipelines

/** Runs the three composed lifecycles end-to-end on sf0.001 (the wiring
  * smoke test analog of the reference's DAG-integrity pytest, SURVEY.md §5). */
class PipelinesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("retail lifecycle gates all pass (§3.3)") {
    val stages = Pipelines.retailLifecycle(spark, dir)
    assert(stages.map(_.stage) == Seq("check_load", "check_transform", "check_report"))
    assert(stages.forall(_.ok), stages.mkString("; "))
  }

  test("meta lifecycle promotes on first run and incrementally re-runs (§3.1)") {
    val work = Files.createTempDirectory("graft_meta").toString
    val first = Pipelines.metaLifecycle(spark, dir, work)
    assert(first.forall(_.ok), first.mkString("; "))
    assert(first.last.detail == "promoted")
    val prodCount = spark.read.parquet(s"$work/production").count()
    assert(prodCount > 0)
    // second run: watermark filters everything, merge is a no-op re-promote
    val second = Pipelines.metaLifecycle(spark, dir, work)
    assert(second.forall(_.ok), second.mkString("; "))
    assert(spark.read.parquet(s"$work/production").count() == prodCount)
  }

  test("transformCsv dedups a column end-to-end (transform_csv.py)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_tcsv").toString
    Seq(("a", 1), ("a", 2), ("b", 3), (null, 4)).toDF("name", "v")
      .write.option("header", "true").csv(s"$dir/in")
    val schema = StructType(Seq(StructField("name", StringType), StructField("v", IntegerType)))
    Pipelines.transformCsv(spark, s"$dir/in", s"$dir/out", "name", schema)
    val out = spark.read.option("header", "true").csv(s"$dir/out")
      .as[String].collect().toSet
    assert(out == Set("a", "b"))
  }

  test("sync lifecycle fans out per dimension with counts (§3.2)") {
    val stages = Pipelines.syncLifecycle(spark, dir)
    assert(stages.length == 3 && stages.forall(_.ok))
    assert(stages.forall(s => s.detail == "skip" || s.detail.startsWith("insert=")))
  }

  test("withRetries retries transient failures, surfaces the final one with history (C6)") {
    var calls = 0
    val got = Pipelines.withRetries(3) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3)

    var calls2 = 0
    val e = intercept[RuntimeException] {
      Pipelines.withRetries(2) { calls2 += 1; throw new RuntimeException(s"fail $calls2") }
    }
    assert(calls2 == 2 && e.getMessage == "fail 2")
    assert(e.getSuppressed.map(_.getMessage).toSeq == Seq("fail 1"))
  }
}
