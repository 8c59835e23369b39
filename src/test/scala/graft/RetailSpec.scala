package graft

import org.apache.spark.sql.functions._
import graft.models.Retail

/** FIXTURES.md §1 fixture: null CustomerID, UnitPrice ≤ 0, Quantity ≤ 0,
  * both date formats, duplicate (StockCode, Description) with differing
  * UnitPrice. */
class RetailSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Seq(
    ("536365", "85123A", "HOLDER", 6, "12/01/2010 08:26", 2.55, Some(17850L), "United Kingdom"),
    ("536366", "85123A", "HOLDER", 4, "1/2/11 8:26", 3.39, Some(17850L), "United Kingdom"), // same product, new price
    ("536367", "71053", "LANTERN", -2, "12/01/2010 08:28", 3.39, Some(13047L), "France"),   // qty <= 0
    ("536368", "84406B", "CUP", 3, "12/01/2010 08:34", 0.0, Some(13047L), "France"),        // price <= 0
    ("536369", "21730", "GLASS", 3, "12/01/2010 08:45", 4.25, None, "Germany")              // null customer
  ).toDF("InvoiceNo", "StockCode", "Description", "Quantity", "InvoiceDate",
    "UnitPrice", "CustomerID", "Country")

  private lazy val country = Seq(
    ("United Kingdom", "GB"), ("France", "FR")).toDF("nicename", "iso")

  test("dimCustomer drops null CustomerID, left-joins ISO (dim_customer.sql)") {
    val d = Retail.dimCustomer(raw, country).collect()
    assert(d.length == 2) // (17850,UK), (13047,FR); null customer dropped
    val uk = d.find(_.getString(1) == "United Kingdom").get
    assert(uk.getString(2) == "GB")
  }

  test("dimProduct keeps price>0, one row per (code,desc,price) (dim_product.sql)") {
    val d = Retail.dimProduct(raw).collect()
    // 85123A appears at two prices -> two dim rows; CUP (price 0) dropped
    assert(d.length == 4)
    assert(!d.exists(_.getString(1) == "84406B"))
  }

  test("dimDatetime parses both formats and extracts parts (dim_datetime.sql)") {
    val d = Retail.dimDatetime(raw)
      .select("datetime", "year", "hour", "weekday").distinct().collect()
    assert(d.forall(!_.isNullAt(0)))
    assert(d.exists(r => r.getInt(1) == 2010 && r.getInt(2) == 8))
    assert(d.exists(r => r.getInt(1) == 2011))
  }

  test("fctInvoices filters and keeps surrogate-key joins consistent (fct_invoices.sql)") {
    val f = Retail.fctInvoices(raw, country).collect()
    // drops: qty<=0 row, price<=0 row, null-customer row
    assert(f.length == 2)
    val totals = f.map(_.getDouble(4)).toSet
    assert(totals == Set(6 * 2.55, 4 * 3.39))
  }

  test("reports reconstruct soda-checked aggregates (A10)") {
    val fct = Retail.fctInvoices(raw, country)
    val dimC = Retail.dimCustomer(raw, country)
    val rep = Retail.reportCustomerInvoices(fct, dimC).collect()
    assert(rep.length == 1 && rep(0).getString(0) == "United Kingdom")
    assert(rep(0).getLong(1) == 2)
  }
}
