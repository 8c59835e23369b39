package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg's hubs & authorities, JACM 1999) over an edge list —
  * the mutually-recursive centrality pair PageRank's single diffusion
  * cannot express: a node is a good HUB when it points at good
  * authorities, a good AUTHORITY when good hubs point at it. On a
  * bipartite interaction graph (customer→supplier, buyer→listing,
  * page→cited-page) the two sides get the two scores: "who curates
  * well" vs "who is endorsed".
  *
  * Fixed-ITERATION, fixed-POINT arithmetic — the same oracle-gated
  * discipline as [[PageRank.pageRankFixedPoint]]: scores are BIGINT
  * mass units, every per-round op is integer (exact long sums,
  * truncating div), and normalization is L1 in mass units
  * (`raw * massUnit div Σraw` — the classic L2 norm needs a square
  * root, which no integer discipline replays; L1 reaches the same
  * fixed ranking). Bit-identical in any engine under any summation
  * order. Overflow bound: `massUnit · Σraw_max ≤ massUnit² · maxDeg`
  * must stay under Long.Max — the 10^6 default leaves six orders of
  * headroom for degree.
  *
  * Scale shape: state is one (node, hub, auth) row per node; each
  * round is two edge-join + groupBy shuffles plus two 1-row total
  * broadcasts; eager checkpoint + release per round, like every other
  * iterative operator here. */
object Hits {

  /** (node, hub_fp, auth_fp) for every node of the directed graph —
    * mass units out of `massUnit` per score side. */
  def hitsFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                     iters: Int = 3, massUnit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && massUnit > 0,
      s"need iters >= 1 and a positive massUnit; got $iters, $massUnit")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "hitsFixedPoint needs at least one edge")
    // Mirror of the overflow bound on the other side: with massUnit < n
    // the integer seed massUnit/n truncates to 0, every L1 total is 0,
    // and the `div s` normalization divides by zero.
    require(massUnit >= n,
      s"massUnit ($massUnit) must be >= node count ($n) or the integer seed truncates to zero")
    var hub = nodes.select(col("node"), lit(massUnit / n).as("hub_fp"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    try {
      var it = 0
      while (it < iters) {
        // authorities: sum incoming hub mass, L1-normalize in units
        val authRaw = e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst")).agg(sum(col("hub_fp")).as("raw"))
          .localCheckpoint(true)
        val sa = broadcast(authRaw.agg(sum(col("raw")).as("s")))
        val nextAuth = authRaw.crossJoin(sa)
          .select(col("dst").as("node"),
            expr(s"(raw * ${massUnit}L) div s").as("auth_fp"))
          .localCheckpoint(true)
        Checkpoints.release(authRaw)
        if (auth != null) Checkpoints.release(auth)
        auth = nextAuth
        // hubs: sum outgoing authority mass, L1-normalize in units
        val hubRaw = e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src")).agg(sum(col("auth_fp")).as("raw"))
          .localCheckpoint(true)
        val sh = broadcast(hubRaw.agg(sum(col("raw")).as("s")))
        val nextHub = hubRaw.crossJoin(sh)
          .select(col("src").as("node"),
            expr(s"(raw * ${massUnit}L) div s").as("hub_fp"))
          .localCheckpoint(true)
        Checkpoints.release(hubRaw)
        Checkpoints.release(hub)
        hub = nextHub
        it += 1
      }
      // materialize the result BEFORE the finally releases the shared
      // inputs its plan reads (the same last-round discipline as
      // pageRankFixedPoint)
      val out = nodes
        .join(hub, Seq("node"), "left")
        .join(auth, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hub_fp"), lit(0L)).as("hub_fp"),
          coalesce(col("auth_fp"), lit(0L)).as("auth_fp"))
        .localCheckpoint(true)
      Checkpoints.release(hub)
      Checkpoints.release(auth)
      out
    } finally {
      Checkpoints.release(e)
      Checkpoints.release(nodes)
    }
  }
}
