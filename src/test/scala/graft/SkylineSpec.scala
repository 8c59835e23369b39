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

  test("native Catalyst skyline operator equals the mapPartitions path and brute force") {
    val pts = (1L to 400L).map(i => (i, (i * 131 % 499).toDouble, (i * 37 % 503).toDouble))
    val df = pts.toDF("id", "x", "y").repartition(6)
    val native = Skyline.skylineNative(df, Seq("x", "y"))
    // SkylineExec renders as "Skyline [cols]" (nodeName strips Exec)
    assert(native.queryExecution.executedPlan.toString.contains("Skyline [x"))
    assert(native.select("id").as[Long].collect().toSet == brute(pts))
    assert(Skyline.skyline(df, Seq("x", "y")).select("id").as[Long].collect().toSet == brute(pts))
  }

  test("both paths accept DECIMAL minimize columns") {
    val df = Seq((1L, BigDecimal("1.00")), (2L, BigDecimal("2.00")), (3L, BigDecimal("1.00")))
      .toDF("id", "price")
    assert(Skyline.skylineNative(df, Seq("price")).select("id").as[Long].collect().toSet
      == Set(1L, 3L)) // equal mins tie — both survive
    assert(Skyline.skyline(df, Seq("price")).select("id").as[Long].collect().toSet
      == Set(1L, 3L))
  }

  test("skyline is idempotent (frontier of a frontier is itself)") {
    val pts = (1L to 200L).map(i => (i, (i * 31 % 101).toDouble, (i * 57 % 103).toDouble))
    val once = Skyline.skyline(pts.toDF("id", "x", "y").repartition(4), Seq("x", "y"))
    val twice = Skyline.skyline(once, Seq("x", "y"))
    assert(once.select("id").as[Long].collect().toSet ==
      twice.select("id").as[Long].collect().toSet)
  }

  test("incrementalTopK over a corpus split equals top-k over the union") {
    import graft.llm.Similarity
    val dim = 8
    def vec(seed: Long) = Array.tabulate(dim)(j => ((seed * 31 + j * 7) % 13 - 6).toFloat)
    val all = (0L until 40L).map(i => (i, vec(i)))
    val queries = all.take(3).toDF("vec_id", "embedding")
    val (oldC, newC) = all.splitAt(25)
    val full = Similarity.bruteForceTopK(queries, all.toDF("vec_id", "embedding"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val existing = Similarity.bruteForceTopK(queries, oldC.toDF("vec_id", "embedding"), 5)
    val incr = Similarity.incrementalTopK(existing, queries, newC.toDF("vec_id", "embedding"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(incr == full)
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
