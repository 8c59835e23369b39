package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import scala.collection.mutable.ArrayBuffer

/** Skyline (Pareto-dominance) operator: rows not dominated by any other
  * row, minimizing every column in `minimize` — the multi-criteria
  * frontier query ("cheapest AND earliest") that plain SQL can only state
  * as a quadratic NOT EXISTS. (Pattern: Skyline-in-Spark-SQL literature,
  * e.g. EDBT 2023 "Integration of Skyline Queries into Spark SQL"; this
  * is the classic two-phase distributed scheme.)
  *
  * Scale shape: phase 1 computes a LOCAL skyline per partition with a
  * block-nested-loop over the partition's running frontier (the frontier
  * stays small — dominated rows are evicted as stronger rows arrive);
  * phase 2 re-runs the same pass over the union of local skylines on one
  * task. A row dominated globally is dominated in its own partition's
  * local pass or by a surviving local-skyline row, so the two phases are
  * exact — and the global pass touches |partitions| × |local frontier|
  * rows, not the corpus. No shuffle of the input, one tiny exchange.
  *
  * Dominance: y dominates x iff y ≤ x on every minimize column and y < x
  * on at least one. Ties/duplicates (equal on all columns) do not
  * dominate each other — both survive, matching the NOT EXISTS oracle
  * semantics. Minimize columns must be non-null numerics (cast dates to
  * epoch first; flip sign to maximize).
  */
object Skyline {

  def skyline(df: DataFrame, minimize: Seq[String]): DataFrame = {
    require(minimize.nonEmpty, "skyline needs at least one minimize column")
    val schema = df.schema
    val idx = minimize.map(schema.fieldIndex).toArray
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)

    def vals(r: Row): Array[Double] = idx.map { i =>
      r.get(i) match {
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"skyline minimize column must be numeric, got $other")
      }
    }
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var allLe = true; var oneLt = false; var i = 0
      while (i < a.length && allLe) {
        if (a(i) > b(i)) allLe = false
        else if (a(i) < b(i)) oneLt = true
        i += 1
      }
      allLe && oneLt
    }
    def localSkyline(it: Iterator[Row]): Iterator[Row] = {
      val frontier = ArrayBuffer.empty[(Row, Array[Double])]
      it.foreach { r =>
        val v = vals(r)
        if (!frontier.exists { case (_, w) => dominates(w, v) }) {
          frontier.filterInPlace { case (_, w) => !dominates(v, w) }
          frontier += ((r, v))
        }
      }
      frontier.iterator.map(_._1)
    }

    df.mapPartitions(localSkyline _)
      .repartition(1) // the union of local frontiers is small by construction
      .mapPartitions(localSkyline _)
  }

  /** The same semantics as a FIRST-CLASS Catalyst operator (logical node +
    * planner strategy + physical operator over InternalRows — SURVEY.md
    * §7 extension tier (c), registered via GraftExtensions): the skyline
    * appears in `explain` as its own node and composes with Catalyst's
    * pushdown/pruning like any built-in. SkylineSpec asserts both paths
    * produce the identical frontier. */
  def skylineNative(df: DataFrame, minimize: Seq[String]): DataFrame =
    org.apache.spark.sql.graft.SkylinePlan.of(df, minimize)
}
