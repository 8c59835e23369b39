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
        // p_retailprice (per-part list price), NOT l_extendedprice: the
        // price is part of the product surrogate key, so a line-level value
        // would explode dim_product to fact cardinality — unbroadcastable
        // at scale and unfaithful to the reference's unit-price semantics.
        when(col("l_partkey") % 41 === 0, lit(0.0))
          .otherwise(col("p_retailprice")).as("UnitPrice"),
        when(col("o_custkey") % 37 === 0, lit(null).cast(LongType))
          .otherwise(col("o_custkey")).as("CustomerID"),
        col("n_name").as("Country"))
  }

  /** retail.country analog (FIXTURES.md §2): nation as (nicename, iso). */
  def country(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_name").as("nicename"),
      upper(substring(col("n_name"), 1, 2)).as("iso"))

  /** dummy_integration_staging.ads_insights analog (FIXTURES.md §3) from
    * `events`: all numerics landed as strings, money as comma-decimal
    * strings, timestamps as second-precision strings — the Airbyte landing
    * shape the flagship transform has to clean up. */
  /** Comma-decimal money string from an integer cents column — integer-only
    * arithmetic, so both engines render the identical text. (A computed
    * DOUBLE cast to DECIMAL is NOT engine-stable: Spark rounds the exact
    * binary expansion, DuckDB the shortest decimal repr — 2.865 diverges.) */
  private def centsMoney(cents: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat((cents / 100).cast(LongType).cast(StringType), lit(","),
      lpad((cents % 100).cast(StringType), 2, "0"))

  def adsInsights(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val money = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c.cast(DecimalType(18, 2)).cast(StringType), "\\.", ",")
    e.select(
      concat(lit("ad_"), lpad(col("event_id").cast(StringType), 8, "0")).as("ad_id"),
      concat(lit("campaign_id_"), (col("user_id") % 20).cast(StringType)).as("campaign_id"),
      when(col("event_type") === "purchase", "CONVERSIONS")
        .when(col("event_type") === "click", "TRAFFIC")
        .when(col("event_type") === "view", "VIDEO_VIEWS")
        .when(col("event_type") === "signup", "LINK_CLICKS")
        .otherwise("OUTCOME_ENGAGEMENT").as("objective"),
      (col("event_id") % 1000).cast(StringType).as("clicks"),
      ((col("event_id") * 7) % 100000).cast(StringType).as("impressions"),
      (col("event_id") % 500).cast(StringType).as("unique_clicks"),
      money(col("value")).as("spend"),
      centsMoney((col("event_id") * 13) % 100000).as("cpm"),
      centsMoney((col("event_id") * 17) % 10000).as("cpc"),
      centsMoney((col("event_id") * 23) % 1000000).as("conversion_values"),
      date_format(col("ts"), "yyyy-MM-dd").as("date_start"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("created_time"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("updated_time"),
      concat(lit("Account "), (col("user_id") % 5).cast(StringType)).as("account_name"),
      (col("user_id") % 5).cast(StringType).as("account_id"),
      when(col("user_id") % 4 === 0, "Classical")
        .when(col("user_id") % 4 === 1, "CRM")
        .when(col("user_id") % 4 === 2, "Digital")
        .otherwise("Legacy").as("optimization_goal"))
  }

  /** dummy_integration_staging.campaigns analog (FIXTURES.md §4): prefixed
    * ids ('cmpK'); only K<15 exists so a quarter of ads left-join to null. */
  def campaigns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select((col("user_id") % 20).as("k")).distinct()
      .filter(col("k") < 15)
      .select(
        concat(lit("cmp"), col("k").cast(StringType)).as("id"),
        concat(lit("Campaign #"), col("k").cast(StringType)).as("name"),
        lit("ACTIVE").as("status"),
        lit("CONVERSIONS").as("objective"))

  /** Landliebe_2024_lw_q1 sheet analog (FIXTURES.md §6): German-locale TV
    * performance rows; Sender carries canonical publisher names. */
  def mmsSheet(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(
      date_format(col("ts"), "dd.MM.yyyy").as("datum"),
      concat(lit("Motiv "), (col("user_id") % 10).cast(StringType)).as("Motiv"),
      when(col("user_id") % 7 === 0, "RTL II")
        .when(col("user_id") % 7 === 1, "Super RTL")
        .when(col("user_id") % 7 === 2, "RTL Nitro")
        .when(col("user_id") % 7 === 3, "Tele 5")
        .when(col("user_id") % 7 === 4, "Disney Channel")
        .when(col("user_id") % 7 === 5, "SAT.1")
        .otherwise("ProSieben").as("Sender"),
      lit("Landliebe").as("Firma"),
      concat(lit("P"), (col("user_id") % 3).cast(StringType)).as("Produkt"),
      lit("E. 14-49").as("Audience"),
      (col("user_id") % 60).cast(IntegerType).as("Spot_laenge"),
      col("value").as("BRW"),
      ((col("event_id") % 1000).cast(DoubleType) / 10.0).as("GRP"),
      lpad((col("event_id") % 100000000).cast(StringType), 8, "0").as("Block"))
  }

  /** landliebe_2024_kosten_q1 analog (FIXTURES.md §6): cost rows keyed by
    * the same block codes (even event_ids only), publisher names as the
    * variant spellings normalized_costs.sql fixes up, nullable ET. */
  def mmsCosts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("event_id") % 2 === 0)
    e.select(
      when(col("user_id") % 7 === 0, "RTL2")
        .when(col("user_id") % 7 === 1, "SUP RTL")
        .when(col("user_id") % 7 === 2, "rtl nitro")
        .when(col("user_id") % 7 === 3, "Tele5")
        .when(col("user_id") % 7 === 4, "disney channel")
        .when(col("user_id") % 7 === 5, "ARD")
        .otherwise("ZDF").as("Medien"),
      when(col("event_id") % 19 === 0, lit(null).cast(DateType))
        .otherwise(col("ts").cast(DateType)).as("ET"),
      lpad((col("event_id") % 100000000).cast(StringType), 8, "0").as("Blockkodierung"),
      lit("IP Deutschland").as("Vermarkter"),
      col("value").as("Grundpreis_AR"),
      (((col("event_id") * 7) % 50000).cast(DoubleType) / 100.0).as("Netto_AR"),
      (((col("event_id") * 3) % 50000).cast(DoubleType) / 100.0).as("N_N_AR"))
  }

  /** main_taico/main_mms 26-col wide-table analog (FIXTURES.md §5) — the
    * cleaning-model input: synthetic nulls + comma-decimal money strings. */
  def mainWide(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val money = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c.cast(DecimalType(18, 2)).cast(StringType), "\\.", ",")
    e.select(
      col("event_id").as("id"),
      col("ts").cast(DateType).as("date"),
      when(col("user_id") % 11 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("ch"), (col("user_id") % 5).cast(StringType))).as("channel"),
      when(col("user_id") % 13 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("cmp"), (col("user_id") % 20).cast(StringType))).as("campaign"),
      when(col("user_id") % 7 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("pub"), (col("user_id") % 7).cast(StringType))).as("publisher"),
      when(col("event_id") % 17 === 0, lit(null).cast(IntegerType))
        .when(col("event_id") % 31 === 0, lit(-5).cast(IntegerType))
        .otherwise((col("event_id") % 1000).cast(IntegerType)).as("clicks"),
      when(col("event_id") % 23 === 0, lit(null).cast(IntegerType))
        .otherwise(((col("event_id") * 7) % 100000).cast(IntegerType)).as("impressions"),
      money(col("value")).as("media_cost_eur"),
      centsMoney((col("event_id") * 13) % 100000).as("cpm"),
      centsMoney((col("event_id") * 17) % 10000).as("cpc"),
      when(col("event_id") % 29 === 0, col("value") * 3 - 500)
        .otherwise(col("value") * 3).as("revenue"))
  }

  /** InvoiceDate parse for the adapter's 4-digit-year formats (the harness
    * dates span 1995-2001, across the `yy` century pivot that differs
    * between Java and C strptime — so the reference's two-format length
    * dispatch, dim_datetime.sql:7-16, is kept but with %Y years). */
  def parseAdapterTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(c) === 16, to_timestamp(c, "MM/dd/yyyy HH:mm"))
      .otherwise(to_timestamp(c, "M/d/yyyy H:mm"))
}
