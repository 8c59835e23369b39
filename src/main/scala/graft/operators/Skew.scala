package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture. AQE's skew-join
  * splitting (on by default) handles most cases at runtime; these are the
  * explicit tools for the two patterns AQE cannot fix:
  *
  *  - a hot grouping key concentrating an aggregation on one reducer →
  *    [[saltedAggregate]] (two-phase: pre-aggregate per salt, then final);
  *  - a hot join key against a non-broadcastable dimension →
  *    [[replicatedSaltedJoin]] (replicate the dim per salt, spread the
  *    fact deterministically).
  *
  * Salts are derived deterministically (hash of a caller-chosen spread
  * column) so results are reproducible run-to-run.
  */
object Skew {

  /** Deterministic salt in [0, n) from a spread column (use a high-
    * cardinality column NOT part of the key, e.g. the row's unique id). */
  def saltOf(spread: Column, n: Int): Column =
    pmod(xxhash64(spread), lit(n)).cast("int")

  /** Two-phase salted sum/count aggregation: groupBy(keys + salt) partial,
    * then groupBy(keys) final. `sums` maps output column → input column.
    * Equivalent to df.groupBy(keys).agg(sum/count) for any input. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], spread: Column,
                      sums: Map[String, String], countCol: Option[String] = None,
                      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(spread, saltBuckets))
    val partialAggs =
      sums.map { case (out, in) => sum(col(in)).as(s"__p_$out") }.toSeq ++
        countCol.map(c => count(lit(1)).as(s"__p_$c")).toSeq
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.keys.map(out => sum(col(s"__p_$out")).as(out)).toSeq ++
        countCol.map(c => sum(col(s"__p_$c")).as(c)).toSeq
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew DIAGNOSTICS: per-key weight of the `topK` heaviest keys plus
    * distribution stats — the measurement that decides whether salting or
    * broadcast is warranted BEFORE burning a 100 TB shuffle on a hot key.
    * One aggregation pass over the keys (count per key → top-k by weight,
    * a TakeOrdered — no full sort); `skew_ratio` is the heaviest key's
    * share relative to a perfectly uniform spread (1.0 = uniform, ≥ the
    * partition count ⇒ one reducer owns the stage). */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("key_rows"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("key_rows")).as("total_rows")).collect()(0)
    val nKeys = stats.getLong(0).max(1L)
    val total = stats.getLong(1).max(1L)
    counts
      .orderBy(col("key_rows").desc, struct(keys.map(col): _*).asc)
      .limit(topK)
      .withColumn("share", col("key_rows").cast("double") / total.toDouble)
      .withColumn("skew_ratio",
        col("key_rows").cast("double") / (total.toDouble / nKeys.toDouble))
  }

  /** Salted equi join: the dimension is replicated once per salt value
    * (explode), the fact side is salted deterministically, and the join
    * runs on (keys + salt) — a hot key's rows spread over `saltBuckets`
    * reducers instead of one. Semantically identical to
    * fact.join(dim, keys, joinType) for fact-preserving join types ONLY
    * (inner / left / left_semi / left_anti): a right/full outer join would
    * emit every unmatched dim row once per salt replica, so those types
    * are rejected. */
  def replicatedSaltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                           spread: Column, joinType: String = "inner",
                           saltBuckets: Int = 16): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed(joinType.toLowerCase.replace(" ", "")),
      s"replicatedSaltedJoin preserves semantics only for fact-preserving join types, got: $joinType")
    val saltedFact = fact.withColumn("__salt", saltOf(spread, saltBuckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, keys :+ "__salt", joinType).drop("__salt")
  }
}
