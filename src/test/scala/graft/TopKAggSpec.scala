package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAgg

/** TopKAgg (native mergeable per-group top-k) == the window row_number
  * idiom, independent of partition layout — exactness across merges is
  * the whole claim, so the same data is checked under 1, 3, and 17
  * partitions (different map-side heap splits, same answer). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("p").asc)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("g"), col("rnk").cast("long").as("rnk"), col("p"), col("s"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg(col("s"), col("p"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.payload").as("p"), col("col.score").as("s"))

  test("TopKAgg == window top-k under different partitionings, incl. ties and small groups") {
    val rng = new scala.util.Random(7)
    // 40 groups x ~50 rows; coarse scores force ties so the payload
    // tiebreak is actually exercised; group 999 has fewer rows than k
    val rows = (1 to 2000).map { i =>
      (rng.nextInt(40).toLong, rng.nextInt(20).toDouble / 2.0, i.toLong)
    } ++ Seq((999L, 1.0, 9001L), (999L, 1.0, 9002L))
    val df = rows.toDF("g", "s", "p")
    val expected = windowTopK(df, 5).as[(Long, Long, Long, Double)].collect().toSet
    for (n <- Seq(1, 3, 17)) {
      val got = aggTopK(df.repartition(n), 5).as[(Long, Long, Long, Double)].collect().toSet
      assert(got == expected, s"mismatch at $n partitions")
    }
    // k larger than every group: degenerates to a full sorted group
    val all = aggTopK(df.repartition(5), 100000)
    assert(all.count() == rows.size)
  }

  test("TopKAgg ranks NaN scores first regardless of arrival order or partitioning") {
    // NaN sorts GREATEST in Spark's ordering (the window idiom keeps it
    // at rank 1); admission must use the same total order, or a NaN
    // arriving after the heap fills is rejected while an early NaN is
    // kept — partitioning-dependent output. cosineSim yields NaN for
    // zero-norm vectors, so this is a reachable input.
    val nan = Double.NaN
    val early = Seq((1L, nan, 10L), (1L, 5.0, 11L), (1L, 4.0, 12L), (1L, 3.0, 13L))
    val late = Seq((1L, 5.0, 11L), (1L, 4.0, 12L), (1L, 3.0, 13L), (1L, nan, 10L))
    for ((rows, tag) <- Seq((early, "early"), (late, "late")); n <- Seq(1, 3)) {
      val got = aggTopK(rows.toDF("g", "s", "p").repartition(n), 2)
        .select(col("rnk"), col("p")).as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 11L)), s"NaN-$tag at $n partitions: $got")
    }
  }

  test("TopKAgg skips null scores/payloads") {
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(5.0), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(7.0), None), (1L, Some(3.0), Some(12L)))
      .toDF("g", "s", "p")
    val got = aggTopK(df, 2).as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 1L, 10L, 5.0), (1L, 2L, 12L, 3.0)))
  }
}
