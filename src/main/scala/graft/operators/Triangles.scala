package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an edge list — the graph-analytics
  * companion to [[ConnectedComponents]]: where CC answers "which nodes are
  * transitively linked", per-node triangle counts answer "how CLIQUISH is
  * the linkage" (local clustering — e.g. near-dup neighborhoods that are
  * mutual-all-pairs vs chains through one hub, or co-purchase affinity).
  *
  * Algorithm: degree-ordered edge orientation (the MapReduce classic —
  * Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW 2011). Every undirected edge is directed from its
  * lower-(degree, id) endpoint to its higher one; each triangle then has
  * exactly ONE node with two out-edges, so wedges (x→y, x→z with y
  * ordered before z) enumerate each triangle once, closed by a single
  * equi-join back onto the oriented edge set. The orientation bounds
  * out-degree by O(√m), so the wedge intermediate is O(m^1.5) even when
  * the raw degree distribution is power-law — the hub that would
  * produce deg² wedges under arbitrary orientation fans IN, not out.
  * Three shuffles total (degree agg, wedge self-join, closure join),
  * all hash-partitioned equi-joins; nothing touches the driver.
  */
object Triangles {

  /** Per-node triangle participation over the undirected graph given by
    * `edges` (two integral columns; self-loops and duplicate/reversed
    * edges tolerated). Returns ("node", "degree", "triangles") for every
    * node of degree ≥ 2 that closes at least one triangle. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set: distinct (u < v). Query-scoped cache:
    // e feeds the degree agg AND two orientation joins, and the oriented
    // frame below feeds three more consumers — without the caches every
    // consumption re-executes the caller's whole edge plan (measured 2x
    // end-to-end on the co-purchase projection).
    val e = graft.QueryCaches.scoped(edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct())
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // orient by the (deg, id) total order — ties broken by id make the
    // orientation deterministic and engine-identical (the oracle mirrors
    // the same row comparison)
    val keyed = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    val uk = struct(col("du").as("d"), col("u").as("i"))
    val vk = struct(col("dv").as("d"), col("v").as("i"))
    val dir = graft.QueryCaches.scoped(keyed.select(
      when(uk < vk, col("u")).otherwise(col("v")).as("src"),
      when(uk < vk, vk).otherwise(uk).as("dk")))
    // wedge enumeration: two out-edges of the same src, ordered so each
    // unordered out-pair appears once; closure = the (y, z) edge existing
    // in the SAME orientation (y precedes z in the total order, so if
    // {y,z} is an edge it is oriented y→z)
    val wedges = dir.select(col("src"), col("dk").as("k1"))
      .join(dir.select(col("src"), col("dk").as("k2")), "src")
      .filter(col("k1") < col("k2"))
    val closed = wedges.join(
      dir.select(col("src").as("y"), col("dk").as("kc")),
      col("k1.i") === col("y") && col("k2") === col("kc"))
    // each triangle (src, y=k1.i, z=k2.i) counts for all three corners
    val corners = closed.select(explode(array(
      col("src"), col("k1.i"), col("k2.i"))).as("node"))
    corners.groupBy(col("node")).agg(count(lit(1)).as("triangles"))
      .join(deg.select(col("n").as("node"), col("deg").as("degree")), "node")
      .select(col("node"), col("degree"), col("triangles"))
  }
}
