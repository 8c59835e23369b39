package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank == a sequential in-memory reference on the same graph, within
  * float tolerance (distributed double summation is order-dependent, so
  * exact equality is the wrong assertion — 1e-6 per node is far above
  * reordering noise and far below any algorithmic error). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** sequential fixed-point reference, same dangling handling */
  private def reference(edges: Seq[(Long, Long)], d: Double, tol: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    var delta = 1.0
    while (delta > tol) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val inflow = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      out.foreach { case (s, dsts) => dsts.foreach { t => inflow(t) += rank(s) / dsts.size } }
      val next = nodes.map(v => v -> ((1 - d) / n + d * (inflow(v) + dangling / n))).toMap
      delta = nodes.map(v => math.abs(next(v) - rank(v))).sum
      rank = next
    }
    rank
  }

  test("pageRank matches the sequential reference within tolerance; ranks sum to 1") {
    // a directed graph with a hub (1), a cycle (2->3->4->2) and a
    // dangling node (5, no out-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 2L), (2L, 5L), (3L, 5L))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", tol = 1e-10)
      .as[(Long, Double)].collect().toMap
    val want = reference(edges, 0.85, 1e-10)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-6, s"node $v: got $r want ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"ranks sum to ${got.values.sum}")
    // the hub's targets outrank the hub itself (it only receives (1-d)/n)
    assert(got(2L) > got(1L) && got(3L) > got(1L))
  }

  test("pageRank on a symmetric cycle is uniform") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", tol = 1e-12)
      .as[(Long, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-9, s"got $got"))
  }

  /** sequential personalized reference: teleport + dangling mass return
    * only to the seed set, all mass starts on the seeds */
  private def personalizedReference(edges: Seq[(Long, Long)], seeds: Set[Long],
                                    d: Double, iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val s = nodes.filter(seeds).toSet
    val out = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).distinct }
    var rank = nodes.map(v => v -> (if (s(v)) 1.0 / s.size else 0.0)).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val inflow = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      out.foreach { case (v, dsts) => dsts.foreach { t => inflow(t) += rank(v) / dsts.size } }
      rank = nodes.map(v => v -> ((if (s(v)) (1 - d) / s.size else 0.0)
        + d * (inflow(v) + (if (s(v)) dangling / s.size else 0.0)))).toMap
    }
    rank
  }

  test("personalizedPageRankFixedPoint: seed-gated teleport, partitioning-invariant, " +
    "unreachable nodes get zero") {
    // seeds {1}; node 6->7 is a component unreachable from the seed
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 2L), (2L, 5L),
      (3L, 5L), (6L, 7L))
    val U = 1000000000000L
    val seeds = Seq(1L).toDF("seed")
    val got = PageRank.personalizedPageRankFixedPoint(
      edges.toDF("src", "dst"), "src", "dst", seeds, "seed", iters = 12)
      .as[(Long, Long, Long)].collect().map { case (v, _, r) => v -> r }.toMap
    val re = PageRank.personalizedPageRankFixedPoint(
      edges.toDF("src", "dst").repartition(7), "src", "dst", seeds, "seed", iters = 12)
      .as[(Long, Long, Long)].collect().map { case (v, _, r) => v -> r }.toMap
    assert(got == re, "personalized fixed-point ranks changed under repartitioning")
    // nothing reaches the 6->7 component from seed 1: exactly zero mass
    assert(got(6L) == 0L && got(7L) == 0L, s"unreachable nodes hold mass: $got")
    // tracks the sequential double reference
    val want = personalizedReference(edges, Set(1L), 0.85, 12)
    got.foreach { case (v, r) =>
      assert(math.abs(r.toDouble / U - want(v)) < 1e-5,
        s"node $v: fp ${r.toDouble / U} dbl ${want(v)}")
    }
    // seed holds the largest rank at d=0.85 on this graph (direct teleport)
    assert(got(1L) == got.values.max)
  }

  test("pageRankFixedPoint is partitioning-invariant, conserves mass, tracks the double variant") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 2L), (2L, 5L), (3L, 5L))
    val U = 1000000000000L
    val base = PageRank.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst", iters = 20)
      .as[(Long, Long)].collect().toMap
    // bit-identical under a different partition layout — the whole point
    // of the fixed-point variant (a double rank would differ in the last
    // ulps and can flip a rounded comparison)
    val re = PageRank.pageRankFixedPoint(edges.toDF("src", "dst").repartition(7),
      "src", "dst", iters = 20).as[(Long, Long)].collect().toMap
    assert(base == re, "fixed-point ranks changed under repartitioning")
    // truncation drops < n units per round: 20 rounds x 5 nodes bounds
    // the total decay; nothing is created
    val total = base.values.sum
    assert(total <= U && total > U - 20L * 5 * 2, s"mass $total out of bounds")
    // after 20 rounds both variants are near their common fixed point —
    // the integer ranks must track the double ranks to ~1e-6 relative
    val dbl = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", tol = 1e-12)
      .as[(Long, Double)].collect().toMap
    base.foreach { case (v, r) =>
      assert(math.abs(r.toDouble / U - dbl(v)) < 1e-5, s"node $v: fp ${r.toDouble / U} dbl ${dbl(v)}")
    }
  }

  test("HITS: bipartite separation, bounded L1 mass, partition-invariant, hub order sane") {
    // two customers: c1 buys from BOTH suppliers, c2 from one — c1 must
    // out-hub c2; suppliers split authority by their buyer mass
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val r = graft.operators.Hits.hitsFixedPoint(edges, "src", "dst", iters = 4)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // bipartite: customers (even) are pure hubs, suppliers (odd) pure
    // authorities
    assert(r(2L)._2 == 0L && r(4L)._2 == 0L, "customers must carry no authority")
    assert(r(1L)._1 == 0L && r(3L)._1 == 0L, "suppliers must carry no hub score")
    assert(r(2L)._1 > r(4L)._1, "the two-supplier buyer out-hubs the one-supplier buyer")
    assert(r(3L)._2 > r(1L)._2, "the shared supplier out-authorities the exclusive one")
    // L1 mass: each side sums to <= massUnit with bounded truncation loss
    val hubSum = r.values.map(_._1).sum
    val authSum = r.values.map(_._2).sum
    assert(hubSum <= 1000000L && hubSum > 1000000L - 10L, s"hub mass $hubSum")
    assert(authSum <= 1000000L && authSum > 1000000L - 10L, s"auth mass $authSum")
    // bit-identical under a different partition layout
    val re = graft.operators.Hits.hitsFixedPoint(edges.repartition(5),
      "src", "dst", iters = 4)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r == re, "fixed-point HITS changed under repartitioning")
  }
}
