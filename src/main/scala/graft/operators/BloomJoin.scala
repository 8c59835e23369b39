package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** Bloom-filter pre-join pruning — the explicit form of runtime
  * row-level filtering for a 100 TB fact ⋈ selective-dim join.
  *
  * When the dim side is selective but too large (or too late) to
  * broadcast as a hash relation, a bloom filter over its join keys IS
  * broadcastable: kilobytes per million keys. Filtering the fact with
  * `might_contain` BEFORE the shuffle drops the non-matching majority at
  * the scan, so the join shuffles only (approximately) the matching
  * rows. No false negatives — every true match survives; false
  * positives (rate set by bits/key) are eliminated by the real join
  * that follows, so the RESULT is bit-identical to the plain join and
  * only the shuffled volume changes.
  *
  * Spark's own optimizer injects this shape automatically in some plans
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator is
  * the deterministic, always-on form built from the same native
  * machinery — `BloomFilterAggregate` (a mergeable
  * TypedImperativeAggregate) and the codegen'd `BloomFilterMightContain`
  * predicate — not a UDF.
  */
object BloomJoin {

  /** One-row frame holding a bloom filter over `xxhash64(keyCol)` of
    * `dim` (the aggregate is partial-merge capable: each partition
    * builds locally, one tiny final merge). `numBits` defaults to
    * ~8 bits/key ⇒ ~2% false-positive rate. */
  def bloomOf(dim: DataFrame, keyCol: String, expectedItems: Long,
              numBits: Long = 0L): DataFrame = {
    val bits = if (numBits > 0) numBits else 8L * expectedItems
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(col(keyCol))),
      bridge.expression(lit(expectedItems)),
      bridge.expression(lit(bits))).toAggregateExpression()
    dim.agg(bridge.column(agg).as("bloom"))
  }

  /** `fact` rows whose `factKey` might be in `dim`'s `dimKey` set: the
    * bloom builds on the dim side as a SCALAR SUBQUERY (the shape
    * `might_contain` requires, and the one InjectRuntimeFilter itself
    * emits) — its one-row result is evaluated once and inlined into a
    * map-side codegen'd predicate; no shuffle of `fact` happens here.
    * Guaranteed superset of the true semi-join (no false negatives);
    * follow with the real join for exactness. */
  def bloomFiltered(fact: DataFrame, factKey: String, dim: DataFrame,
                    dimKey: String, expectedItems: Long): DataFrame = {
    val bloomPlan = bloomOf(dim, dimKey, expectedItems).queryExecution.analyzed
    fact.filter(bridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomPlan),
      bridge.expression(xxhash64(col(factKey))))))
  }
}
