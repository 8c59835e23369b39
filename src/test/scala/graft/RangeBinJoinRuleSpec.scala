package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, RangeBinJoinRule}

class RangeBinJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def pts = spark.range(0, 2000)
    .select(($"id" * 7 % 3000 - 500).as("p"), $"id".as("pid"))
  private def ranges = spark.range(0, 120)
    .select($"id".as("rid"), ($"id" * 25 - 500).as("lo"), ($"id" * 25 - 440).as("hi"))

  private def bandJoin = pts.join(ranges, $"p" >= $"lo" && $"p" <= $"hi")

  private def withWidth[A](w: String)(body: => A): A = {
    spark.conf.set(RangeBinJoinRule.WidthConf, w)
    try body finally spark.conf.unset(RangeBinJoinRule.WidthConf)
  }

  test("band join rewrites to an equi-join on bins and keeps the naive result (negatives included)") {
    val want = bandJoin.select("pid", "rid").as[(Long, Long)].collect().toSet
    val got = withWidth("64") {
      val df = bandJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      df.select("pid", "rid").as[(Long, Long)].collect().toSet
    }
    assert(got == want)
    // without the conf the rule must not fire
    val plain = bandJoin.queryExecution.executedPlan.toString
    assert(plain.contains("BroadcastNestedLoopJoin") || plain.contains("CartesianProduct"))
  }

  test("extra non-equi conjuncts survive as filters; result unchanged") {
    def q = pts.join(ranges, $"p" >= $"lo" && $"p" <= $"hi" && $"pid" =!= $"rid")
    val want = q.select("pid", "rid").as[(Long, Long)].collect().toSet
    val got = withWidth("10") {
      assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      q.select("pid", "rid").as[(Long, Long)].collect().toSet
    }
    assert(got == want)
  }

  test("joins that already have an equi-conjunct are left alone") {
    def q = pts.join(ranges, $"p" % 120 === $"rid" && $"p" >= $"lo")
    val before = q.select("pid", "rid").as[(Long, Long)].collect().toSet
    withWidth("10") {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), s"rule fired on an equi-join:\n$plan")
      assert(q.select("pid", "rid").as[(Long, Long)].collect().toSet == before)
    }
  }

  test("inverted (lo > hi) ranges match nothing under the rewrite (no descending explode)") {
    val p1 = Seq((1L, 5L)).toDF("pid", "p")
    val r1 = Seq((7L, 0L, 10L), (8L, 2000000000L, 0L)).toDF("rid", "lo", "hi")
    val got = withWidth("1") {
      p1.join(r1, $"p" >= $"lo" && $"p" <= $"hi")
        .select("rid").as[Long].collect().toSeq
    }
    assert(got == Seq(7L))
  }

  test("a malformed width conf is ignored instead of failing every query") {
    withWidth("90days") {
      assert(spark.range(3).count() == 3)
      assert(bandJoin.count() > 0)
    }
  }

  test("outer joins and non-integral bands are not rewritten") {
    withWidth("10") {
      val leftOuter = pts.join(ranges, $"p" >= $"lo" && $"p" <= $"hi", "left")
      assert(!leftOuter.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val dbl = pts.select(($"p" + 0.5).as("pd"), $"pid")
        .join(ranges, $"pd" >= $"lo" && $"pd" <= $"hi")
      assert(!dbl.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }
}
