package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step of a near-dup pipeline: LSH emits candidate pairs, and transitive
  * closure over those pairs defines the duplicate groups a dedup policy
  * (keep-one-per-cluster) acts on.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — each
  * round is two hash aggregations + a join, the edge set only shrinks
  * toward min-rooted stars, and convergence is O(log n) rounds on
  * worst-case graphs (vs O(diameter) for plain label propagation, which
  * is unbounded on path graphs). Nothing is collected to the driver
  * except a per-round (count, checksum) convergence scalar; per-round
  * `localCheckpoint` truncates the lineage that otherwise grows
  * per-iteration and blows up replay at scale.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (two integral
    * columns `srcCol`, `dstCol`; self-loops and duplicates tolerated).
    * Returns ("node", "component") for every node incident to an edge,
    * where component = the minimum node id in the node's component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical working set: distinct directed-down pairs (u > v)
    var e = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    def signature(df: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free under ANSI (a long
      // sum of 64-bit hashes overflows); count disambiguates xor collisions
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // large-star(center c): neighbors strictly above c link to
    // m = min(N(c) ∪ {c}); small-star(center c): the below-or-equal
    // neighborhood (plus c itself) links to its minimum. Both emit only
    // (bigger, smaller) pairs, keeping the canonical orientation.
    //
    // Per-center minima come from a keyed WINDOW min rather than a
    // groupBy + join-back: one shuffle per star instead of two (the sort
    // a window costs is the same machinery a sort-merge join would
    // spend). Duplicate edges are not dropped inside large-star —
    // small-star's terminal distinct canonicalizes, duplicates only ride
    // along for one round.
    val byCenter = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    def largeStar(cur: DataFrame): DataFrame = {
      val nbrs = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      nbrs.withColumn("m", least(min(col("v")).over(byCenter), col("u")))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    def smallStar(cur: DataFrame): DataFrame = {
      // emit (v, m) for every below-neighbor v plus the center's own
      // (u, m) — the explode keeps it one window pass over the edges
      cur.withColumn("m", min(col("v")).over(byCenter))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .filter(col("e.a") =!= col("e.b"))
        .select(greatest(col("e.a"), col("e.b")).as("u"),
          least(col("e.a"), col("e.b")).as("v"))
        .distinct()
    }

    var sig = signature(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // LAZY localCheckpoint: the signature aggregation is the first
      // action over the marked RDD, so ONE job per round both
      // materializes the round's blocks and computes the convergence
      // scalar (an eager checkpoint + separate agg paid two passes).
      // (Batching two alternations per checkpoint was tried and measured
      // SLOWER at sf0.1 — the deeper per-job plan (4 window shuffles)
      // costs more than the job-scheduling overhead it saves.)
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next)
      converged = nextSig == sig
      // free the superseded round's blocks, or maxIter rounds of edge
      // sets pile up in executor storage until a driver GC
      Checkpoints.release(e)
      e = next; sig = nextSig; it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // converged edge set is min-rooted stars: every non-root points at its
    // component min, and each root's neighbors are all above it — so
    // min(N(x) ∪ {x}) labels roots and leaves alike.
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
    nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u").as("node"), least(col("mv"), col("u")).as("component"))
  }
}
