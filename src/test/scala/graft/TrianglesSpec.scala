package graft

import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val nodes = deg.keys.toSeq.sorted
    val cnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if und((i, j)) && und((j, k)) && und((i, k))
    } Seq(i, j, k).foreach(n => cnt(n) += 1L)
    (deg, cnt.toMap)
  }

  test("degree-ordered triangle counts == brute force on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val (deg, want) = brute(edges)
    val got = Triangles.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._3).toMap == want.filter(_._2 > 0))
    got.foreach { case (n, d, _) => assert(deg(n) == d, s"degree of $n") }
  }

  test("hub star closes no triangles; one rim edge closes exactly one") {
    val star = (1L to 10L).map(i => (0L, i))
    assert(Triangles.triangleCounts(star.toDF("a", "b"), "a", "b").count() == 0)
    val plus = star :+ ((3L, 7L))
    val got = Triangles.triangleCounts(plus.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(0L -> 1L, 3L -> 1L, 7L -> 1L))
  }

  test("duplicate and reversed edges do not inflate counts") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (1L, 2L))
    val got = Triangles.triangleCounts(tri.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
