package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) over an edge
  * list — the lightweight community-detection companion to
  * [[ConnectedComponents]] (CC merges everything reachable; LPA splits a
  * connected graph into dense regions). Every node starts labeled with
  * itself; each round every node simultaneously adopts the most frequent
  * label among its neighbors, ties broken by the SMALLEST label — the
  * deterministic variant (classic LPA breaks ties randomly, which no
  * cross-engine gate could replay).
  *
  * FIXED rounds, not run-to-convergence, for the same reason as
  * [[KCore]]/[[PageRank]]: a bounded, engine-replayable job count (sync
  * LPA can oscillate on bipartite structures, so a convergence loop may
  * not even terminate). Each round is two keyed aggregations — count
  * labels over incident edges, then an argmax fold via struct-min
  * ((-count, label)) so no window over the node set is needed. Per-round
  * `localCheckpoint` + release keeps lineage flat and frees superseded
  * label frames; the symmetrized edge list is checkpointed ONCE and
  * reused every round. All shuffles key on node id — at 1000 executors
  * each round is two hash exchanges over (node, label) pairs, never
  * adjacency payloads.
  */
object LabelPropagation {

  /** Community label per node after `rounds` synchronous updates over
    * the undirected graph given by `edges` (self-loops and
    * duplicate/reversed edges tolerated). Output: (node, community,
    * community_size). */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one propagation round")
    val canon = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val und = canon.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(canon.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(true)
    var lbl = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    try {
      for (_ <- 1 to rounds) {
        // argmax label = ArgMinLongPair over (-count, label): identical
        // semantics to the min(struct((-c), l)).lb idiom but with a FLAT
        // (long, long, bool) buffer, so both aggregations hash-aggregate
        // with whole-stage codegen — the struct-buffer form planned a
        // SortAggregate with a Sort on each side of the exchange every
        // round (r20 measurement; see ArgMinLongPair's scaladoc, which
        // also records why the two-phase and packed-long rewrites lost)
        val next = und.join(lbl, und("dst") === lbl("node"))
          .select(und("src").as("n"), lbl("lbl").as("l"))
          .groupBy(col("n"), col("l"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("n"))
          .agg(org.apache.spark.sql.graft.ArgMinLongPair
            .argminValue(-col("c"), col("l")).as("lbl"))
          .select(col("n").as("node"), col("lbl"))
          .localCheckpoint(true)
        Checkpoints.release(lbl)
        lbl = next
      }
      val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      lbl.join(sizes, "lbl")
        .select(col("node"), col("lbl").as("community"), col("community_size"))
        .localCheckpoint(true)
    } finally {
      Checkpoints.release(lbl)
      Checkpoints.release(und)
    }
  }
}
