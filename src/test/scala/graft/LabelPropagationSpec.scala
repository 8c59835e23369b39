package graft

import graft.operators.LabelPropagation

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** local reference: R synchronized rounds, most-frequent neighbor
    * label, ties to the smallest label */
  private def lpaLocal(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val canon = edges.filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct
    val adj = (canon ++ canon.map(_.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, ns) =>
        val counts = ns.map(lbl).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    lbl
  }

  test("fixed-round sync LPA == local simulation on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    for (rounds <- Seq(1, 2, 4)) {
      val got = LabelPropagation.propagate(edges.toDF("a", "b"), "a", "b", rounds)
        .select("node", "community").as[(Long, Long)].collect().toMap
      assert(got == lpaLocal(edges, rounds), s"rounds=$rounds")
    }
  }

  test("two triangles joined by a bridge keep separate communities") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = LabelPropagation.propagate(g.toDF("a", "b"), "a", "b", rounds = 4)
      .select("node", "community").as[(Long, Long)].collect().toMap
    assert(got == lpaLocal(g, 4))
    // min-label propagation keeps the triangles in distinct communities:
    // every member of {1,2,3} ends on a label from its own triangle, and
    // no node of {4,5,6} shares it
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(4L, 5L, 6L).map(got)
    assert(left.intersect(right).isEmpty)
  }

  test("community_size counts the members of each final label") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val rows = LabelPropagation.propagate(g.toDF("a", "b"), "a", "b", rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    val byLabel = rows.groupBy(_._2)
    byLabel.foreach { case (_, members) =>
      members.foreach { case (_, _, sz) => assert(sz == members.size.toLong) }
    }
  }
}
