package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Maps the harness TPC-H-ish tables (TESTDATA.md) onto the reference's
  * source shapes (FIXTURES.md) so the reference-parity models can run on
  * real volume. Every synthetic twist (two date formats, nulls, non-positive
  * quantities/prices) is keyed on deterministic modular arithmetic so the
  * DuckDB oracle can reproduce it exactly (see SparkEntry.oracleSql's
  * RAW_INVOICES CTE).
  */
object TestdataAdapter {

  /** retail.raw_invoices analog (FIXTURES.md §1): lineitem ⋈ orders ⋈ part ⋈
    * customer ⋈ nation. Dimension sides are broadcast — at 100 TB the fact
    * table dominates and this stays a map-side join chain. */
  def rawInvoices(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val p = Tables.part(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("o_orderkey").cast(StringType).as("InvoiceNo"),
        concat(lit("SC"), col("l_partkey").cast(StringType)).as("StockCode"),
        col("p_name").as("Description"),
        when(col("l_orderkey") % 53 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")).cast(IntegerType).as("Quantity"),
        when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm"))
          .otherwise(date_format(col("o_orderdate"), "M/d/yyyy H:mm")).as("InvoiceDate"),
        when(col("l_partkey") % 41 === 0, lit(0.0))
          .otherwise(col("l_extendedprice")).as("UnitPrice"),
        when(col("o_custkey") % 37 === 0, lit(null).cast(LongType))
          .otherwise(col("o_custkey")).as("CustomerID"),
        col("n_name").as("Country"))
  }

  /** retail.country analog (FIXTURES.md §2): nation as (nicename, iso). */
  def country(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_name").as("nicename"),
      upper(substring(col("n_name"), 1, 2)).as("iso"))

  /** InvoiceDate parse for the adapter's 4-digit-year formats (the harness
    * dates span 1995-2001, across the `yy` century pivot that differs
    * between Java and C strptime — so the reference's two-format length
    * dispatch, dim_datetime.sql:7-16, is kept but with %Y years). */
  def parseAdapterTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(c) === 16, to_timestamp(c, "MM/dd/yyyy HH:mm"))
      .otherwise(to_timestamp(c, "M/d/yyyy H:mm"))
}
