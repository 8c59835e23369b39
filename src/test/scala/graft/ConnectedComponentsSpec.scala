package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** reference answer: plain union-find with min-id relabeling */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // roots are already component minima because unions always hang the
    // larger root under the smaller one
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("matches union-find on seeded random graphs (sparse, dense, clustered)") {
    val params = Gen.Parameters.default
    def graph(n: Int, m: Int, idSpace: Long, seed: Long): Seq[(Long, Long)] =
      Gen.listOfN(m, Gen.zip(Gen.choose(0L, idSpace), Gen.choose(0L, idSpace)))
        .apply(params, Seed(seed)).get
    for ((n, m, space, seed) <- Seq((0, 30, 40L, 1L), (0, 300, 120L, 2L),
        (0, 25, 1000000L, 3L), (0, 500, 90L, 4L))) {
      val edges = graph(n, m, space, seed)
      assert(run(edges) == unionFind(edges), s"seed=$seed")
    }
  }

  test("path graph (worst case for label propagation) converges to one component") {
    val path = (0L until 200L).map(i => (i, i + 1))
    val got = run(path)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (9L, 9L))
    val got = run(edges)
    // pure self-loop nodes have no real edge -> not incident, excluded
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set yields empty components") {
    assert(run(Seq.empty[(Long, Long)]).isEmpty)
  }
}
