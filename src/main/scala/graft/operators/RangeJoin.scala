package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range join without a cross product.
  *
  * Spark plans a plain `p BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin (fine only while the range side broadcasts) or,
  * for two large inputs, a cartesian product — both scale-killers. The
  * standard fix (used by range-join implementations in several engines) is
  * bin bucketing: quantize the domain into fixed-width bins, explode each
  * range row to every bin it covers, compute the single covering bin for
  * each point row, equi-join on the bin, and re-check the exact predicate.
  * The join becomes a hash join that shuffles (or broadcasts) on `bin`,
  * and each point row carries exactly one bin, so no dedup is needed.
  *
  * `binWidth` trades replication for selectivity: range rows are
  * replicated `ceil(len/binWidth)+1` times, and each bin's candidate set
  * shrinks as bins narrow. A width near the typical range length keeps
  * replication ~2x while bounding candidates to ranges overlapping one
  * bin. At 1000-executor scale both sides hash-partition on `bin`, so the
  * work spreads; a skewed bin (many ranges covering one hot bin) is the
  * same skew AQE's skew-join handling already splits.
  */
object RangeJoin {

  /** Inner-join `points` (integral column `pointCol`) to `ranges`
    * (integral `loCol`/`hiCol`, inclusive on both ends). Output columns:
    * all point columns plus all range columns; callers project/aggregate
    * after. Column name collisions are the caller's to avoid. */
  def pointInRange(points: DataFrame, ranges: DataFrame, pointCol: String,
                   loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // inverted (lo > hi) or null-bounded ranges match nothing under
    // BETWEEN — drop them BEFORE the explode, where sequence(start, stop)
    // would otherwise count DOWNWARD and blow up on one dirty row
    val binned = ranges.filter(col(loCol) <= col(hiCol)).withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val pts = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    pts.join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pairs (l, r) whose inclusive integral
    * intervals [lLo,lHi] × [rLo,rHi] intersect. Same bin trick as
    * [[pointInRange]], but BOTH sides explode to their covering bins, so
    * a pair spanning several shared bins would match once per bin — the
    * match is therefore claimed only in the FIRST shared bin
    * (max(floor(lLo/w), floor(rLo/w))), which keeps the join
    * duplicate-free without a distinct over arbitrary payload columns.
    * An overlapping pair always shares that bin: the later-starting
    * interval's first bin contains its lo, which (on overlap) lies
    * within the other interval's bin span. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLoCol: String, lHiCol: String,
                      rLoCol: String, rHiCol: String,
                      binWidth: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi)).withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    // keyCols (same names both sides, e.g. an entity id for self-overlap)
    // ride the equi key alongside the bin, so the hash join partitions on
    // (key, bin) — candidates never cross entities
    binned(left, lLoCol, lHiCol)
      .join(binned(right, rLoCol, rHiCol), "__bin" +: keyCols)
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .filter(col("__bin") ===
        greatest(floor(col(lLoCol) / binWidth).cast("long"),
          floor(col(rLoCol) / binWidth).cast("long")))
      .drop("__bin")
  }
}
