package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** The two-pass distributed prefix sum must equal the single-task global
  * window it replaces — including across many partitions (offsets), empty
  * partitions (ranges with no rows), and a partition count larger than
  * the row count. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cum",
      sum(col("v")).over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("matches the global-window running sum across partitionings") {
    val df = (1L to 1000L).map(i => (i, (i * 7) % 13)).toDF("k", "v")
    val expected = windowed(df).select("k", "cum").as[(Long, Long)].collect().toMap
    for (nPart <- Seq(1, 4, 32, 2000)) { // 2000 > row count → empty ranges
      val got = PrefixSum.withGlobalPrefixSum(df, "k", "v", "cum", nPart)
        .select("k", "cum").as[(Long, Long)].collect().toMap
      assert(got == expected, s"mismatch at numPartitions=$nPart")
      QueryCaches.releaseAll()
    }
  }

  test("last row's inclusive sum is the grand total; order keys need not be dense") {
    val df = Seq((10L, 5L), (3L, 2L), (99L, 1L), (47L, 10L)).toDF("k", "v")
    val out = PrefixSum.withGlobalPrefixSum(df, "k", "v", "cum", 3)
      .orderBy("k").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(3L, 10L, 47L, 99L))
    assert(out.last._3 == 18L)
    assert(out.map(_._3).toSeq == Seq(2L, 7L, 17L, 18L))
    QueryCaches.releaseAll()
  }

  test("conf-following overload partitions by spark.sql.shuffle.partitions") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("k", "v")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val out = PrefixSum.withGlobalPrefixSum(df, "k", "v", "cum")
      assert(out.rdd.getNumPartitions == 7)
      assert(out.orderBy(col("k").desc).limit(1)
        .select("cum").as[Long].collect().head == 100L)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      QueryCaches.releaseAll()
    }
  }

  test("rejects non-BIGINT value columns") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.withGlobalPrefixSum(df, "k", "v", "cum", 2)
    }
  }
}
