package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a total sort — iterative histogram-
  * refinement selection (the textbook distributed k-th-element algorithm;
  * same family as Munro-Paterson / iterative bucketing selection).
  *
  * A global `orderBy` is the one thing a 100 TB column must never do:
  * range-partition + full sort shuffles every row. Selection instead runs
  * a handful of AGGREGATION passes: each round one column-pruned scan
  * bins the current candidate range into `bins` exact counts (partial-agg
  * combines map-side, so the shuffle is ≤ `bins` longs per partition),
  * walks the cumulative histogram to the bin holding the target rank, and
  * narrows to it — the range shrinks ~`bins`× per round, so even a full
  * double range resolves in ≤6 rounds. The final ≤ `collectCap`
  * candidates are resolved exactly on the driver (a bounded, documented
  * collect — 100k doubles, not a table scan).
  *
  * Exactness does not lean on float bin edges: the narrowed range is
  * widened 1 ulp on both sides (a SUPERSET of the chosen bin) and the
  * rank-below / count-in for the new range are re-counted with compare
  * predicates in one pass, so a boundary value mis-binned by the floor
  * expression can never be lost.
  */
object Selection {

  /** Exact k-th smallest (1-based) value of a non-null double column.
    * `pre`: optional precomputed (n, min, max) so multi-quantile callers
    * pay the first pass once. */
  def kthSmallest(values: DataFrame, valueCol: String, k: Long,
                  bins: Int = 8192, collectCap: Int = 100000,
                  pre: Option[(Long, Double, Double)] = None): Double = {
    val v = col(valueCol).cast("double")
    val (n, mn, mx) = pre.getOrElse {
      val r = values.agg(count(v), min(v), max(v)).head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    require(k >= 1 && k <= n, s"k=$k outside 1..$n")
    var lo = mn; var hi = mx
    var kRem = k // rank of the target within [lo, hi]
    var cntIn = n // candidates in [lo, hi]
    var rounds = 0
    while (true) {
      if (lo == hi) return lo
      if (cntIn <= collectCap) {
        val arr = values.filter(v >= lo && v <= hi)
          .select(v).collect().map(_.getDouble(0)).sorted
        return arr((kRem - 1).toInt)
      }
      val ulp = Math.ulp(math.max(math.abs(lo), math.abs(hi)))
      if (hi - lo <= bins.toDouble * ulp) {
        // ≤ ~bins representable doubles left (sub-ulp bin widths would
        // stall the refinement here): resolve on exact per-value counts
        val dist = values.filter(v >= lo && v <= hi)
          .groupBy(v.as("d")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
        var cum = 0L
        dist.foreach { case (value, c) =>
          cum += c; if (cum >= kRem) return value
        }
        throw new IllegalStateException(s"rank walk exhausted: k=$kRem")
      }
      rounds += 1
      require(rounds <= 64, "selection did not converge (non-finite data?)")
      val w = (hi - lo) / bins
      val bin = least(lit(bins - 1), greatest(lit(0),
        floor((v - lo) / w).cast("int")))
      val hist = values.filter(v >= lo && v <= hi)
        .groupBy(bin.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0; var cum = 0L
      while (cum + hist.getOrElse(b, 0L) < kRem) {
        cum += hist.getOrElse(b, 0L); b += 1
      }
      // 1-ulp widened bounds: a superset of bin b whatever the float
      // rounding in the bin expression did at the edges
      val nLo = math.max(lo, Math.nextDown(lo + b * w))
      val nHi = math.min(hi, if (b == bins - 1) hi else Math.nextUp(lo + (b + 1) * w))
      val rc = values.filter(v >= lo && v <= hi).agg(
        count(when(v < nLo, 1)).as("below"),
        count(when(v >= nLo && v <= nHi, 1)).as("inn")).head()
      kRem -= rc.getLong(0)
      cntIn = rc.getLong(1)
      lo = nLo; hi = nHi
      require(kRem >= 1 && kRem <= cntIn, s"selection invariant broke: k=$kRem in=$cntIn")
    }
    Double.NaN // unreachable
  }

  /** Continuous (interpolated) quantiles, exact: rank rn = q*(n-1), result
    * = x[floor(rn)] + (rn - floor(rn)) * (x[ceil(rn)] - x[floor(rn)]) —
    * the formula is mirrored TEXTUALLY by the DuckDB oracle so the double
    * arithmetic is engine-identical. The input column is cached for the
    * multi-pass refinement and released before returning; k-th results
    * are memoized across quantiles that share a rank. */
  def quantileCont(values: DataFrame, valueCol: String, qs: Seq[Double],
                   bins: Int = 8192, collectCap: Int = 100000): Seq[Double] = {
    val cached = values.select(col(valueCol).cast("double").as(valueCol)).cache()
    try {
      val r = cached.agg(count(col(valueCol)), min(col(valueCol)), max(col(valueCol))).head()
      val pre = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      val n = pre._1
      require(n > 0, "quantileCont over an empty column")
      val memo = scala.collection.mutable.Map.empty[Long, Double]
      def kth(k: Long): Double =
        memo.getOrElseUpdate(k, kthSmallest(cached, valueCol, k, bins, collectCap, Some(pre)))
      qs.map { q =>
        val rn = q * (n - 1)
        val frn = math.floor(rn)
        val k = frn.toLong + 1
        val vLo = kth(k)
        if (rn == frn) vLo
        else vLo + (rn - frn) * (kth(k + 1) - vLo)
      }
    } finally cached.unpersist(blocking = false)
  }
}
