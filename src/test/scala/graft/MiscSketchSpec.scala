package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates (no cross-engine oracle —
  * approximations are engine-specific by design). */
class MiscSketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within its rsd bound; percentile_approx brackets the exact value") {
    val n = 10000
    val df = (1 to n).map(i => (i.toLong, (i % 2000).toDouble)).toDF("id", "v")
    val row = df.agg(
      approx_count_distinct($"id").as("ad"),
      percentile_approx($"v", lit(0.5), lit(1000)).as("p50")).collect()(0)
    val approx = row.getLong(0)
    assert(math.abs(approx - n) < n * 0.05, s"approx=$approx") // default rsd ~2.3%
    val p50 = row.getDouble(1)
    assert(p50 >= 900 && p50 <= 1100, s"p50=$p50") // exact median ≈ 1000
  }
}
