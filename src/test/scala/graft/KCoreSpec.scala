package graft

import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** local reference: R synchronized peel rounds, then induced degrees */
  private def peelLocal(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var e = edges.filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct
    def deg(es: Seq[(Long, Long)]): Map[Long, Long] =
      es.flatMap(x => Seq(x._1, x._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    for (_ <- 1 to rounds) {
      val alive = deg(e).filter(_._2 >= k).keySet
      e = e.filter(x => alive(x._1) && alive(x._2))
    }
    deg(e)
  }

  test("fixed-round peel == local simulation on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    for (rounds <- Seq(1, 3, 10)) {
      val got = KCore.kCorePeel(edges.toDF("a", "b"), "a", "b", k = 3, rounds = rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == peelLocal(edges, 3, rounds), s"rounds=$rounds")
    }
  }

  test("triangle with a tail: core survives, tail peels; one round peels only the frontier") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val after1 = KCore.kCorePeel(g.toDF("a", "b"), "a", "b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // round 1 removes only degree-1 node 5; node 4 still present with its
    // remaining edge to 3 — the fixed-round over-approximation
    assert(after1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    val after3 = KCore.kCorePeel(g.toDF("a", "b"), "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(after3 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
