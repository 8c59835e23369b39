package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArgMinLongPair

/** ArgMinLongPair (flat-buffer hash-aggregable argmin) == the
  * min(struct(key, value)).value idiom it replaces, independent of
  * partition layout (map-side partial merges exercised at 1/3/17
  * partitions), including key ties (value tiebreak), NULL inputs
  * (ignored), and all-NULL groups (NULL result). Also pins the plan
  * claim that motivated it: the aggregation HASH-aggregates, no
  * SortAggregate. */
class ArgMinLongPairSpec extends SparkSpec {
  import spark.implicits._

  test("ArgMinLongPair == min(struct).value under different partitionings, ties and nulls") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 3000).map { i =>
      (rng.nextInt(50).toLong,
        java.lang.Long.valueOf(rng.nextInt(6).toLong), // coarse keys: ties
        java.lang.Long.valueOf(rng.nextInt(1000).toLong))
    } ++ Seq(
      (777L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)),
      (777L, java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      (778L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Long]))
    val df = rows.toDF("g", "k", "v")
    // the reference form, computed over the fully-non-null rows (the
    // flat aggregate's documented contract: null key OR value ignored —
    // note min(struct) itself would rank a null FIELD first, which is
    // exactly the footgun the explicit contract avoids); groups with no
    // valid row (778) expect NULL
    val expected = df.filter(col("k").isNotNull && col("v").isNotNull)
      .groupBy(col("g"))
      .agg(min(struct(col("k"), col("v"))).as("m"))
      .select(col("g"), col("m.v").as("v"))
      .as[(Long, Option[Long])].collect().toMap
      // groups whose every row had a null key or value (777: one
      // null-key row + one null-value row; 778: all-null) vanish from
      // the filtered reference — the aggregate reports them as NULL
      .updated(777L, None: Option[Long])
      .updated(778L, None: Option[Long])
    for (n <- Seq(1, 3, 17)) {
      val got = df.repartition(n).groupBy(col("g"))
        .agg(ArgMinLongPair.argminValue(col("k"), col("v")).as("v"))
        .as[(Long, Option[Long])].collect().toMap
      // group 778 is all-null: expected NULL from both forms
      assert(got(778L).isEmpty, "all-null group must evaluate to NULL")
      assert(got == expected, s"mismatch at $n partitions")
    }
  }

  test("plans as hash aggregate (the reason it exists)") {
    val df = Seq((1L, 2L, 3L)).toDF("g", "k", "v")
      .groupBy(col("g"))
      .agg(ArgMinLongPair.argminValue(col("k"), col("v")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate, got:\n$plan")
    assert(!plan.contains("SortAggregate"), s"unexpected SortAggregate:\n$plan")
  }
}
