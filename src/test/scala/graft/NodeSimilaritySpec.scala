package graft

import org.apache.spark.sql.functions._
import graft.operators.NodeSimilarity

/** Hub safety of the degree-capped wedge join: an artificial hub (the
  * co-purchase fixture is too benign — max degree 71) must contribute
  * ZERO wedge pairs as a center, while still counting in denominators. */
class NodeSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) = {
    val e = edges.toDF("a", "b")
    e.select(col("a").as("n"), col("b").as("m"))
      .unionAll(e.select(col("b").as("n"), col("a").as("m")))
  }

  test("capped == uncapped when no node exceeds the cap") {
    // two triangles sharing an edge: (1,2,3) and (2,3,4)
    val und = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    val a = NodeSimilarity.jaccardPairs(und, 2, 256)
      .drop("center_deg_cap").collect().toSet
    val b = NodeSimilarity.jaccardPairs(und, 2, 1000000)
      .drop("center_deg_cap").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("a hub above the cap emits no wedges but still counts in degrees") {
    // hub 0 connected to 1..500 (degree 500 > cap 100); besides the hub,
    // nodes 1..6 form a clique (each pair shares 4 non-hub common
    // neighbors + the hub). With the cap, common counts exclude the hub.
    val hubEdges = (1L to 500L).map(i => (0L, i))
    val clique = for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)
    val und = QueryCaches.scoped(sym(hubEdges ++ clique))
    val out = NodeSimilarity.jaccardPairs(und, 4, 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    QueryCaches.releaseAll()
    // 15 clique pairs + 6 (hub, clique-member) pairs: the hub may still be
    // a pair ENDPOINT (reached via low-degree centers); only its role as a
    // wedge center is capped
    val cliquePairs = (for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)).toSet
    val hubPairs = (1L to 6L).map(i => (0L, i)).toSet
    assert(out.keySet == cliquePairs ++ hubPairs)
    val ((c, da, db, ppm)) = out((1L, 2L))
    assert(c == 4)       // the hub is NOT counted as a common neighbor
    assert(da == 6 && db == 6) // full degree: 5 clique peers + the hub
    assert(ppm == 4L * 1000000 / (6 + 6 - 4))
    // hub-endpoint pair: 5 common capped centers, full hub degree in the
    // denominator
    assert(out((0L, 1L)) == ((5L, 500L, 6L, 5L * 1000000 / (500 + 6 - 5))))
    // no pair exists ONLY via the hub as center: leaf nodes 7..500 share
    // only the hub with everything → absent entirely
    assert(!out.keySet.exists { case (x, y) => x > 6 || y > 6 })
  }
}
