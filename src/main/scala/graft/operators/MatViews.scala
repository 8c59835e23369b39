package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MatViewRewriteRule

/** Materialized summary tables + the Catalyst rewrite that uses them
  * (org.apache.spark.sql.graft.MatViewRewriteRule — the Goldstein-Larson
  * summary-table optimization).
  *
  * [[create]] materializes per-`dims` partials of the fact — `__cnt`
  * plus `__sum_/__min_/__max_` per measure — and registers the summary
  * so any eligible aggregate over the FACT PATH is silently rewritten
  * to roll up the dims-cardinality summary instead of scanning the
  * fact: the difference between a 100 TB scan and a few-MB one for
  * every dashboard-grain query. The partial layout is exactly
  * `Meta.incrementalAggMerge`'s mergeable form, so an append-only fact
  * keeps its MV current per-batch without rebuilds. Rewrites fire only
  * in sessions where the rule is installed (GraftFunctions.register or
  * the spark.sql.extensions config). */
object MatViews {

  // __cntn_m (per-measure NON-NULL count) is what makes count(m) and
  // avg(m) exactly rewritable — count(*) alone can't distinguish nulls
  private def partialAggs(measures: Seq[String]): Seq[Column] =
    count(lit(1)).as("__cnt") +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"__sum_$m"),
      min(col(m)).as(s"__min_$m"),
      max(col(m)).as(s"__max_$m"),
      count(col(m)).as(s"__cntn_$m")))

  /** Raw fact rows → the summary's partial layout. */
  private def partials(fact: DataFrame, dims: Seq[String],
                       measures: Seq[String]): DataFrame = {
    val aggs = partialAggs(measures)
    fact.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build + register. The fact must be readable at `factPath` (that
    * path identity is what the rule matches). */
  def create(spark: SparkSession, factPath: String, dims: Seq[String],
             measures: Seq[String], mvPath: String): Unit = {
    partials(spark.read.parquet(factPath), dims, measures)
      .write.mode("overwrite").parquet(mvPath)
    MatViewRewriteRule.register(spark, factPath, mvPath, dims, measures)
  }

  /** IVM maintenance: fold an APPEND-ONLY `delta` of fact rows into the
    * summary WITHOUT rescanning the fact — counts/sums merge by SUM,
    * min/max by MIN/MAX (every stored partial is self-mergeable), so
    * the cost is one partial agg over the delta plus a
    * group-cardinality merge. Re-registers the summary afterwards: the
    * rule caches the MV's analyzed scan (with its file listing), which
    * the overwrite invalidates. Updates/deletes need a rebuild
    * ([[create]]) — min/max partials are not subtractable. */
  def maintain(spark: SparkSession, factPath: String, mvPath: String,
               dims: Seq[String], measures: Seq[String], delta: DataFrame): Unit = {
    val mergeAggs = sum(col("__cnt")).as("__cnt") +: measures.flatMap(m => Seq(
      sum(col(s"__sum_$m")).as(s"__sum_$m"),
      min(col(s"__min_$m")).as(s"__min_$m"),
      max(col(s"__max_$m")).as(s"__max_$m"),
      sum(col(s"__cntn_$m")).as(s"__cntn_$m")))
    val merged = spark.read.parquet(mvPath)
      .unionByName(partials(delta, dims, measures), allowMissingColumns = false)
      .groupBy(dims.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      // break lineage before overwriting our own input files
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(mvPath)
    graft.operators.Checkpoints.release(merged)
    MatViewRewriteRule.register(spark, factPath, mvPath, dims, measures)
  }

  /** Register an already-built summary (e.g. one maintained by
    * Meta.incrementalAggMerge). */
  def register(spark: SparkSession, factPath: String, mvPath: String,
               dims: Seq[String], measures: Seq[String]): Unit =
    MatViewRewriteRule.register(spark, factPath, mvPath, dims, measures)

  /** Drop all registrations (tests / session teardown). */
  def clear(): Unit = MatViewRewriteRule.clear()
}
