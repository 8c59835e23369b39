package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._

/** The mms/google_sheets dbt models (reference: include/dbt/models/mms/):
  * German-locale TV performance sheets joined to cost sheets on a
  * normalized 3-part key (SURVEY.md §2.3 J2, §2.8 F4/F5/F9).
  */
object Mms {

  /** mms_lb_staged.sql:1-17 — staged TV performance rows: `dd.MM.yyyy`
    * date parse (F9), spot-length concat (F3), 8-digit block-code regex
    * reformat (F5), literal channel/property columns (F14).
    * `added_at = current_timestamp()` is kept out of oracle-checked
    * projections (nondeterministic by nature). */
  def lbStaged(sheet: DataFrame, withAddedAt: Boolean = false): DataFrame = {
    val base = sheet.select(
      // midnight TIMESTAMP (see Meta.fbAdsTransformed date note)
      to_timestamp(col("datum"), "dd.MM.yyyy").as("date"),             // F9 :1
      lit("TV").as("channel"),                                         // F14 :2
      col("Motiv").as("campaign"),
      col("Sender").as("publisher"),
      lit("DE").as("property"),
      concat(col("Spot_laenge").cast(StringType), lit(" second spot")).as("media_type"), // F3 :8
      lit("Classical").as("media_cluster"),
      // BRW/GRP stay DOUBLE (source doubles are exact 2-dec values; a
      // DECIMAL cast only invites engine-specific decimal normalization)
      col("BRW").cast(DoubleType).as("unique"),
      col("GRP").cast(DoubleType).as("grp_circulation"),
      col("Firma").as("owner"),
      col("Produkt").as("product"),
      col("Audience").as("audience"),
      lit("MMS").as("product_group"),
      blockCode(col("Block")).as("block_code"))                        // F5 :16
    if (withAddedAt) base.withColumn("added_at", current_timestamp()) else base
  }

  /** normalized_costs.sql:1-15 — channel-name normalization CASE (F6) +
    * `ET is not null` source filter (P4). */
  def normalizedCosts(costs: DataFrame): DataFrame =
    costs
      .filter(col("ET").isNotNull)                                     // :14
      .select(
        when(col("Medien") === "RTL2", "RTL II")                       // F6 :4-12
          .when(col("Medien") === "SUP RTL", "Super RTL")
          .when(col("Medien") === "Tele5", "Tele 5")
          .when(col("Medien") === "rtl nitro", "RTL Nitro")
          .when(col("Medien") === "disney channel", "Disney Channel")
          .otherwise(col("Medien")).as("publisher"),
        col("ET").cast(TimestampType).as("date"),
        blockCode(col("Blockkodierung")).as("block_code"),
        col("Vermarkter").as("marketer"),
        col("Grundpreis_AR").cast(DoubleType).as("gross_media_cost"),
        col("Netto_AR").cast(DoubleType).as("net_media_cost"),
        col("N_N_AR").cast(DoubleType).as("net_net_media_cost"))

  /** staging_performance_cost_combined.sql:24-50 — J2: left join
    * performance × costs on (block_code, date, normalized publisher).
    * The normalization (strip non-alphanumerics, lower — F4) is
    * precomputed on both sides so the join stays a plain equi join that
    * Catalyst can broadcast or sort-merge; the cost side is a dimension
    * feed, so it is broadcast. */
  def performanceCostCombined(perf: DataFrame, costs: DataFrame): DataFrame = {
    val p = perf.withColumn("norm_publisher", normName(col("publisher")))
    val c = costs.select(
      col("block_code"), col("date"),
      normName(col("publisher")).as("norm_publisher"),
      col("gross_media_cost"), col("net_media_cost"), col("net_net_media_cost"))
    p.join(broadcast(c), Seq("block_code", "date", "norm_publisher"), "left")
      .drop("norm_publisher")
  }
}
