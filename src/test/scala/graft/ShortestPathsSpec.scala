package graft

import graft.operators.ShortestPaths

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  /** local reference: R synchronized Bellman–Ford relaxations */
  private def bfLocal(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                      rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)) -> e._3)
      .groupBy(_._1).map { case (k, ws) => k -> ws.map(_._2).min }
      .toSeq.flatMap { case ((u, v), w) => Seq((u, v, w), (v, u, w)) }
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = und.flatMap { case (s, t, w) => dist.get(s).map(ds => t -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  test("fixed-round Bellman–Ford == local simulation on a seeded random weighted graph") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(250)(
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong, (rnd.nextInt(9) + 1).toLong))
    val seeds = Seq(0L, 17L)
    for (rounds <- Seq(1, 2, 4)) {
      val got = ShortestPaths.bellmanFord(edges.toDF("a", "b", "w"), "a", "b", "w",
        seeds.toDF("n"), "n", rounds).as[(Long, Long)].collect().toMap
      assert(got == bfLocal(edges, seeds.toSet, rounds), s"rounds=$rounds")
    }
  }

  test("longer-but-cheaper path beats the direct heavy edge once rounds allow it") {
    // 1—4 direct cost 10; 1—2—3—4 cost 3
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val r1 = ShortestPaths.bellmanFord(g.toDF("a", "b", "w"), "a", "b", "w",
      Seq(1L).toDF("n"), "n", rounds = 1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    val r3 = ShortestPaths.bellmanFord(g.toDF("a", "b", "w"), "a", "b", "w",
      Seq(1L).toDF("n"), "n", rounds = 3).as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("parallel edges collapse to the min weight per pair") {
    val g = Seq((1L, 2L, 7L), (2L, 1L, 2L), (1L, 2L, 5L))
    val got = ShortestPaths.bellmanFord(g.toDF("a", "b", "w"), "a", "b", "w",
      Seq(1L).toDF("n"), "n", rounds = 1).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L))
  }
}
