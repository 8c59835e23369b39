package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInRange == naive BETWEEN join on a seeded random instance") {
    val params = Gen.Parameters.default
    def longs(n: Int, lo: Long, hi: Long, seed: Long): Seq[Long] =
      Gen.listOfN(n, Gen.choose(lo, hi)).apply(params, Seed(seed)).get
    val pts = longs(500, 0, 1000, 11).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val starts = longs(60, 0, 950, 12)
    val lens = longs(60, 0, 120, 13)
    val ranges = starts.zip(lens).zipWithIndex
      .map { case ((s, l), i) => (i.toLong, s, s + l) }.toDF("rid", "lo", "hi")
    for (binWidth <- Seq(1L, 7L, 64L, 100000L)) {
      val got = RangeJoin.pointInRange(pts, ranges, "p", "lo", "hi", binWidth)
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      val want = pts.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(got == want, s"binWidth=$binWidth")
    }
  }

  test("range ends are inclusive on both sides, negative domain works") {
    val pts = Seq((1L, -10L), (2L, 0L), (3L, 10L), (4L, 11L)).toDF("pid", "p")
    val ranges = Seq((7L, -10L, 10L)).toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(pts, ranges, "p", "lo", "hi", 4L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("inverted (lo > hi) ranges match nothing instead of exploding a descending sequence") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    // one sane range and one wildly inverted one (would be ~1e9 bins)
    val ranges = Seq((7L, 0L, 10L), (8L, 1000000000L, 0L)).toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(pts, ranges, "p", "lo", "hi", 1L)
      .select("rid").as[Long].collect().toSeq
    assert(got == Seq(7L))
  }

  test("plan is an equi-join: no nested-loop / cartesian node") {
    val pts = spark.range(100).select(col("id").as("p"))
    val ranges = spark.range(10).select(col("id").as("rid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 15).as("hi"))
    val plan = RangeJoin.pointInRange(pts, ranges, "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected a hash equi-join on the bin, got:\n$plan")
  }

  test("intervalOverlap == naive overlap join, duplicate-free across shared bins") {
    val rng = new scala.util.Random(23)
    // intervals up to 5 bins long so most overlapping pairs share SEVERAL
    // bins — the first-shared-bin claim must still emit each pair once
    val mk = (n: Int, tag: String) => (1 to n).map { i =>
      val lo = rng.nextInt(200).toLong; (s"$tag$i", lo, lo + rng.nextInt(50))
    }
    import spark.implicits._
    val l = mk(120, "L").toDF("lid", "llo", "lhi")
    val r = mk(150, "R").toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(l, r, "llo", "lhi", "rlo", "rhi", binWidth = 10L)
      .select("lid", "rid").as[(String, String)].collect()
    val naive = l.crossJoin(r)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").as[(String, String)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == naive.toSet,
      s"mismatch: missing=${(naive.toSet -- got.toSet).take(5)} extra=${(got.toSet -- naive.toSet).take(5)}")
  }
}
