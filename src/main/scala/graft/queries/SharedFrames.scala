package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Session-shared source projections for the snapshot/catalog/stream
  * query families.
  *
  * ~40 registered queries open with the identical staging projection of
  * the orders table (orderkey/custkey/orderdate + exact cents) and then
  * consume it three to eight times each (commit slices, DML batches,
  * expected-value aggregates). Before r20 every consumption re-scanned
  * orders.parquet — the single most repeated scan in the bench. The base
  * projection is now a plain unscoped `.cache()` (the established retail
  * raw/fct and coPurchaseEdges pattern): the cache manager plan-matches
  * every query's identical subtree to ONE session materialization, and
  * the narrow variants below derive from it. This mirrors what the
  * reference pipeline does at scale — materialize the staging projection
  * once, feed every downstream model from it.
  *
  * Kept deliberately narrow: 4 columns of longs/timestamp (~5 MB at
  * sf0.1). None of the replaced sites had parquet-pushable predicates
  * (modulo slices and derived-column ranges don't push), so caching
  * trades no pushdown away. */
object SharedFrames {
  private def ordersBase(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .cache()

  /** (o_orderkey, cents) — the dominant snapshot-table staging frame. */
  def ordersCents(s: SparkSession, d: String): DataFrame =
    ordersBase(s, d).select(col("o_orderkey"), col("cents"))

  /** (k, cents) — the key-renamed variant. */
  def ordersKCents(s: SparkSession, d: String): DataFrame =
    ordersBase(s, d).select(col("o_orderkey").as("k"), col("cents"))

  /** (day, cents) — the date-partition staging variant. */
  def ordersDayCents(s: SparkSession, d: String): DataFrame =
    ordersBase(s, d).select(to_date(col("o_orderdate")).as("day"), col("cents"))

  /** (o_custkey, cents) — the customer-keyed variant. */
  def ordersCustCents(s: SparkSession, d: String): DataFrame =
    ordersBase(s, d).select(col("o_custkey"), col("cents"))
}
