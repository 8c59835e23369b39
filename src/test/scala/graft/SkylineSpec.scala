package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(points: Seq[(Long, Double, Double)]): Set[Long] = {
    def dom(a: (Long, Double, Double), b: (Long, Double, Double)) =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    points.filter(p => !points.exists(q => dom(q, p))).map(_._1).toSet
  }

  test("two-phase skyline equals the brute-force dominance frontier") {
    // deterministic pseudo-random points (no RNG: x/y from modular arithmetic)
    val pts = (1L to 500L).map(i => (i, (i * 7919 % 997).toDouble, (i * 104729 % 991).toDouble))
    val out = Skyline.skyline(pts.toDF("id", "x", "y").repartition(8), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(out == brute(pts))
  }

  test("duplicates of an undominated point all survive; dominated rows drop") {
    val pts = Seq((1L, 1.0, 5.0), (2L, 1.0, 5.0), // duplicate frontier points
      (3L, 2.0, 6.0), // dominated by 1/2
      (4L, 0.5, 9.0)) // frontier (cheaper, later)
    val out = Skyline.skyline(pts.toDF("id", "x", "y"), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L))
  }
}
