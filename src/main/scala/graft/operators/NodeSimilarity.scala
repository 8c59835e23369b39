package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set similarity over an undirected adjacency frame — the wedge
  * join (pairs of neighbors of a shared center node) that powers
  * link-prediction / item-item statistics (node Jaccard, Adamic–Adar).
  *
  * Hub safety: a plain wedge join is Σ deg(w)² over wedge CENTERS w. On a
  * power-law graph one hub of degree D emits D² candidate pairs — a
  * 100k-degree hub alone is 10^10 rows, a scale-killer regardless of
  * cluster size. The standard mitigation (e.g. DIMSUM's probability-
  * capped emission, or plain frequency capping in item-item CF) is to
  * bound the center's contribution. Here: wedge centers with degree >
  * `centerDegCap` are EXCLUDED, bounding per-center cost at cap² and
  * total cost at |V|·cap². Semantics become "similarity via non-hub
  * common neighbors" — defensible on the same grounds as Adamic–Adar's
  * 1/ln(deg) weighting: co-membership in a hub's neighborhood carries
  * almost no similarity signal (everything is connected to the hub).
  * The cap is cited as a constant output column so downstream consumers
  * see the contract, and the oracle replays the identical cap.
  */
object NodeSimilarity {

  /** Pairs (a < b) sharing ≥ `minCommon` common neighbors of degree ≤
    * `centerDegCap`, scored common/|N(a) ∪ N(b)| in exact integer ppm.
    * `und` must be the symmetric adjacency (both directions present),
    * columns (n, m) = (node, neighbor). Degrees in the denominator are
    * FULL degrees (hubs still count as set members — only their role as
    * wedge centers is capped). */
  def jaccardPairs(und: DataFrame, minCommon: Long, centerDegCap: Long): DataFrame = {
    // query-scoped caches (the Triangles lesson): deg feeds the center
    // gate plus two denominator joins, centers feeds both wedge sides —
    // without them every consumption re-executes the caller's adjacency
    // plan, whatever that costs
    val cachedUnd = graft.QueryCaches.scoped(und)
    val deg = graft.QueryCaches.scoped(
      cachedUnd.groupBy(col("n")).agg(count(lit(1)).as("deg")))
    val centers = cachedUnd.join(
      deg.filter(col("deg") <= centerDegCap).select(col("n")), Seq("n"))
    val common = centers.select(col("n").as("w"), col("m").as("a"))
      .join(centers.select(col("n").as("w"), col("m").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    common
      .join(deg.select(col("n").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        expr("common * 1000000 DIV (deg_a + deg_b - common)").as("jaccard_ppm"),
        lit(centerDegCap).as("center_deg_cap"))
  }

  /** Adamic–Adar link prediction with the SAME hub-capped wedge join as
    * [[jaccardPairs]]: pairs (a < b) sharing ≥ `minCommon` common
    * neighbors of degree ≤ `centerDegCap`, each common neighbor w
    * weighted 1/ln(deg(w)). The weight is rounded ONCE per center to a
    * scaled BIGINT (aa9 = round(1e9/ln deg)), making the per-pair sum
    * order-independent and engine-exact. The cap bounds the |hub|²
    * wedge blow-up exactly as in jaccardPairs — and is even MORE
    * defensible here: a capped hub's wedges carry weight 1/ln(D) → 0,
    * so the excluded mass is the part Adamic–Adar already discounts to
    * nearly nothing. Degree-1 centers are excluded up front (they form
    * no wedge, and ln(1)=0 would poison their weight). The cap is a
    * constant output column; the oracle replays it. */
  def adamicAdar(und: DataFrame, minCommon: Long, centerDegCap: Long): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val cachedUnd = graft.QueryCaches.scoped(und)
    val deg = graft.QueryCaches.scoped(
      cachedUnd.groupBy(col("n")).agg(count(lit(1)).as("deg")))
    val centers = graft.QueryCaches.scoped(
      cachedUnd.join(deg.filter(col("deg").between(2L, centerDegCap)), Seq("n"))
        .withColumn("aa9",
          round(lit(1e9) / log(col("deg").cast(DoubleType))).cast(LongType)))
    centers.select(col("n").as("w"), col("m").as("a"), col("aa9"))
      .join(centers.select(col("n").as("w"), col("m").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"), sum(col("aa9")).as("aa_e9"))
      .filter(col("common") >= minCommon)
      .select(col("a"), col("b"), col("common"), col("aa_e9"),
        (col("aa_e9").cast(DoubleType) / lit(1e9)).as("adamic_adar"),
        lit(centerDegCap).as("center_deg_cap"))
  }
}
