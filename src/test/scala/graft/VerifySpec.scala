package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verify's dump loop must fail LOUDLY: a query that throws at dump time
  * becomes an entry in the returned error map (→ verify_errors.json, exit 1),
  * never a silent omission — the round-8 regression class where broken
  * queries shrank the correctness denominator invisibly. */
class VerifySpec extends SparkSpec {

  test("a throwing query yields an error record; healthy ones still dump") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_query" -> ((s: SparkSession, _: String) => s.range(3).toDF("n")),
      "boom_query" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("deliberate analysis failure")),
      "bad_type_query" -> ((s: SparkSession, _: String) =>
        s.range(1).select(array(lit(1), lit(2)).as("arr"))))
    val errors = Verify.dumpAll(spark, queries, sfDir = "/nonexistent", out)
    assert(errors.keySet == Set("boom_query", "bad_type_query"))
    assert(errors("boom_query").contains("deliberate analysis failure"))
    assert(errors("bad_type_query").contains("driver-unhashable"))
    // the healthy query's parquet landed; the broken ones left no dir
    assert(spark.read.parquet(s"$out/ok_query").count() == 3)
    assert(!new java.io.File(s"$out/boom_query").exists())
  }

  test("jsonStr escapes quotes, backslashes, and control chars") {
    assert(Verify.jsonStr(("a\"b\\c\nd\te" + 1.toChar + "f")) ==
      "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }
}
