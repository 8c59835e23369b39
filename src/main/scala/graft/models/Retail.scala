package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._

/** The retail star-schema models (reference: include/dbt/models/transform
  * dim_customer.sql, dim_product.sql, dim_datetime.sql, fct_invoices.sql
  * + reconstructed report models, SURVEY.md §2.4 A10, §3.3).
  *
  * Inputs are reference-shaped DataFrames:
  *   rawInvoices(InvoiceNo, StockCode, Description, Quantity: int,
  *               InvoiceDate: string(two formats), UnitPrice, CustomerID, Country)
  *   country(nicename, iso)
  *
  * All models are pure DataFrame→DataFrame; Catalyst handles pushdown and
  * pruning. Dim joins are broadcast-eligible (dims are orders of magnitude
  * smaller than the fact) — fct() hints broadcast explicitly so the plan is
  * stable at 100 TB fact scale.
  */
object Retail {

  /** dim_customer — distinct surrogate(CustomerID, Country) + ISO join.
    * Reference: include/dbt/models/transform/dim_customer.sql:1-16. */
  def dimCustomer(rawInvoices: DataFrame, country: DataFrame): DataFrame =
    rawInvoices
      .filter(col("CustomerID").isNotNull)                       // :9
      .select(
        surrogateKey(col("CustomerID"), col("Country")).as("customer_id"), // :6
        col("Country").as("country"))
      .distinct()
      .join(broadcast(country), col("country") === col("nicename"), "left") // :11-15
      .select(col("customer_id"), col("country"), col("iso"))

  /** dim_product — distinct surrogate(StockCode, Description, UnitPrice),
    * price > 0. Reference: dim_product.sql:1-12. */
  def dimProduct(rawInvoices: DataFrame): DataFrame =
    rawInvoices
      .filter(col("UnitPrice") > 0)                              // :11
      .select(
        surrogateKey(col("StockCode"), col("Description"), moneyStr(col("UnitPrice"))).as("product_id"),
        col("StockCode").as("stock_code"), col("Description").as("description"),
        // DOUBLE passthrough (source prices are exact 2-dec): DECIMAL in the
        // output would survive to engine-specific decimal normalization
        col("UnitPrice").as("unit_price"))
      .distinct()

  /** dim_datetime — distinct two-format parse of InvoiceDate + EXTRACT parts.
    * Reference: dim_datetime.sql:1-29. Weekday keeps BigQuery/Spark 1-7
    * (Sunday=1); the reference's soda check expects 0-6 — a latent
    * off-by-one in the reference, documented in SURVEY.md §2.8 F11. */
  def dimDatetime(rawInvoices: DataFrame,
                  parse: Column => Column = parseInvoiceTs): DataFrame = {
    val parsed = parse(col("InvoiceDate"))
    rawInvoices
      .select(col("InvoiceDate"))
      .distinct()
      .select(
        surrogateKey(col("InvoiceDate")).as("datetime_id"),
        parsed.as("datetime"),
        year(parsed).as("year"), month(parsed).as("month"),
        dayofmonth(parsed).as("day"), hour(parsed).as("hour"),
        minute(parsed).as("minute"), dayofweek(parsed).as("weekday"))
  }

  /** fct_invoices — surrogate keys, Quantity>0 filter, total = qty*price,
    * inner join to the three dims. Reference: fct_invoices.sql:1-26.
    * Dims are broadcast: the fact side scales with data volume, dims with
    * distinct-key cardinality, so at cluster scale this is a map-side join. */
  def fctInvoices(rawInvoices: DataFrame, country: DataFrame): DataFrame = {
    val fact = rawInvoices
      .filter(col("Quantity") > 0 && col("CustomerID").isNotNull) // :13
      .select(
        col("InvoiceNo").as("invoice_id"),
        surrogateKey(col("InvoiceDate")).as("datetime_id"),
        surrogateKey(col("StockCode"), col("Description"), moneyStr(col("UnitPrice"))).as("product_id"),
        surrogateKey(col("CustomerID"), col("Country")).as("customer_id"),
        // int × 2-dec double: the same correctly-rounded IEEE product in
        // every engine — no decimal cast needed or wanted in the output
        (col("Quantity") * col("UnitPrice")).as("total")) // :11
    fact
      .join(broadcast(dimDatetime(rawInvoices).select("datetime_id")), Seq("datetime_id"))
      .join(broadcast(dimProduct(rawInvoices).select("product_id")), Seq("product_id"))
      .join(broadcast(dimCustomer(rawInvoices, country).select("customer_id")), Seq("customer_id"))
      .select("invoice_id", "datetime_id", "product_id", "customer_id", "total")
  }

  /** report_customer_invoices — reconstructed from soda check columns
    * (include/soda/checks/report/report_customer_invoices.yml:4-8):
    * per-country invoice counts + revenue. */
  def reportCustomerInvoices(fct: DataFrame, dimCustomer: DataFrame): DataFrame =
    fct.join(broadcast(dimCustomer), Seq("customer_id"))
      .groupBy(col("country"))
      .agg(
        countDistinct(col("invoice_id")).as("total_invoices"),
        // aggregate in exact DECIMAL (order-independent — each total is an
        // exact ≤2-dec value), emit DOUBLE (correctly-rounded cast in both
        // engines while the unscaled sum stays below 2^53)
        sum(col("total").cast(DecimalType(18, 2))).cast(DoubleType).as("total_revenue"))

  /** report_product_invoices — per-product quantity sold (soda:
    * report_product_invoices.yml, total_quantity_sold). */
  def reportProductInvoices(rawInvoices: DataFrame): DataFrame =
    rawInvoices
      .filter(col("Quantity") > 0 && col("UnitPrice") > 0)
      .groupBy(col("StockCode").as("stock_code"))
      .agg(sum(col("Quantity")).cast(LongType).as("total_quantity_sold"))

  /** report_year_invoices — invoices per year (soda:
    * report_year_invoices.yml, num_invoices). */
  def reportYearInvoices(fct: DataFrame, dimDatetime: DataFrame): DataFrame =
    fct.join(broadcast(dimDatetime.select(col("datetime_id"), col("year"))), Seq("datetime_id"))
      .groupBy(col("year"))
      .agg(countDistinct(col("invoice_id")).as("num_invoices"))
}
