package graft

import graft.operators.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  /** local reference: synchronized frontier BFS, min hop per node */
  private def bfsLocal(edges: Seq[(Long, Long)], seeds: Set[Long],
                       rounds: Int): Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var visited = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (r <- 1 to rounds) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited.keySet
      visited ++= next.map(_ -> r.toLong)
      frontier = next
    }
    visited
  }

  test("fixed-round BFS == local simulation on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val seeds = Seq(0L, 13L, 27L)
    for (rounds <- Seq(1, 2, 4)) {
      val got = Bfs.bfsHops(edges.toDF("a", "b"), "a", "b",
        seeds.toDF("n"), "n", rounds).as[(Long, Long)].collect().toMap
      assert(got == bfsLocal(edges, seeds.toSet, rounds), s"rounds=$rounds")
    }
  }

  test("path graph: hop = distance, truncated at the round budget; isolated seed stays at 0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Bfs.bfsHops(path.toDF("a", "b"), "a", "b",
      Seq(1L, 99L).toDF("n"), "n", rounds = 2).as[(Long, Long)].collect().toMap
    // nodes 4 and 5 are beyond 2 hops; off-graph seed 99 reports hop 0
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 99L -> 0L))
  }

  test("min-hop wins when frontiers could re-reach a visited node (cycle)") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = Bfs.bfsHops(cyc.toDF("a", "b"), "a", "b",
      Seq(1L).toDF("n"), "n", rounds = 4).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }
}
