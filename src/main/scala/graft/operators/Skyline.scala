package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

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
  * task, behind a real shuffle so phase 1 stays parallel. A row dominated
  * globally is dominated in its own partition's local pass or by a
  * surviving local-skyline row, so the two phases are exact — and the
  * global pass touches |partitions| × |local frontier| rows, not the
  * corpus.
  *
  * Dominance: y dominates x iff y ≤ x on every minimize column and y < x
  * on at least one. Ties/duplicates (equal on all columns) do not
  * dominate each other — both survive, matching the NOT EXISTS oracle
  * semantics. Minimize columns must be non-null numerics (cast dates to
  * epoch first; flip sign to maximize). Shared dominance/frontier logic:
  * [[SkylineCore]].
  */
object Skyline {

  def skyline(df: DataFrame, minimize: Seq[String]): DataFrame = {
    require(minimize.nonEmpty, "skyline needs at least one minimize column")
    val schema = df.schema
    // session-resolver name matching (case-insensitive by default), same
    // resolution rule as the Catalyst-native path
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val idx = minimize.map { n =>
      val i = schema.fields.indexWhere(f => resolver(f.name, n))
      require(i >= 0, s"skyline column '$n' not in ${schema.fieldNames.mkString(", ")}")
      i
    }.toArray
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)

    def vals(r: Row): Array[Double] = idx.map { i =>
      r.get(i) match {
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"skyline minimize column must be numeric and non-null, got $other")
      }
    }
    def pass(it: Iterator[Row]): Iterator[Row] =
      SkylineCore.frontierPass[Row](it, vals, identity)

    df.mapPartitions(pass _)
      .repartition(1) // the union of local frontiers is small by construction
      .mapPartitions(pass _)
  }

  /** The same semantics as a FIRST-CLASS Catalyst operator (logical node +
    * planner strategy + physical operator over InternalRows — SURVEY.md
    * §7 extension tier (c), registered via GraftExtensions): the skyline
    * appears in `explain` as its own node and composes with the
    * surrounding plan like any built-in. SkylineSpec asserts both paths
    * produce the identical frontier. */
  def skylineNative(df: DataFrame, minimize: Seq[String]): DataFrame =
    org.apache.spark.sql.graft.SkylinePlan.of(df, minimize)
}
