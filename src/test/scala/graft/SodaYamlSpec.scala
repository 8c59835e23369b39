package graft

import org.apache.spark.sql.types._
import graft.checks._

/** Declarative check ingestion: a SodaCL-subset file (the shape of the
  * reference's include/soda/checks tree) loads into the Check ADT and
  * evaluates identically to the hand-built suites in ChecksSpec. */
class SodaYamlSpec extends SparkSpec {
  import spark.implicits._

  // A fresh fixture exercising every construct the reference's files use
  // (schema fail block, duplicate/missing/invalid counts, min-with-fail,
  // failed-rows query), written against this repo's dim shapes.
  private val yml = """
# fixture: dim_product-shaped suite
checks for dim_product:
  - schema:
      fail:
        when required column missing:
          [product_id, description, unit_price]
        when wrong column type:
          product_id: string
          unit_price: float64
  - duplicate_count(product_id) = 0:
      name: All products are unique
  - missing_count(product_id) = 0:
      name: All products have a key
  - invalid_count(weekday) = 0:
      name: All weekdays are in range 0-6
      valid min: 0
      valid max: 6
  - min(unit_price):
      fail: when < 0
  - min(total_sold):
      fail: when <= 0
  - failed rows:
      name: No free products
      fail query: |
        SELECT product_id, unit_price
        FROM dim_product
        WHERE unit_price = 0 AND total_sold > 0
"""

  private lazy val df = Seq(
    ("p1", "widget", 10.0, 1, 5L),
    ("p1", "widget2", 2.5, 8, 3L),   // dup product_id; weekday 8 out of range
    (null.asInstanceOf[String], "x", -1.0, 3, 0L), // missing key; negative price; total_sold<=0
    ("p3", "free", 0.0, 4, 2L)       // failed-rows hit (price 0, sold > 0)
  ).toDF("product_id", "description", "unit_price", "weekday", "total_sold")

  test("parses the reference SodaCL constructs into the Check ADT") {
    val suite = SodaYaml.parse(yml)
    assert(suite.table == "dim_product")
    assert(suite.checks.length == 7)
    assert(suite.checks.head == SchemaAndTypes(
      Seq("product_id", "description", "unit_price"),
      Map("product_id" -> StringType, "unit_price" -> DoubleType), name = "schema_0"))
    assert(suite.checks(1) == UniqueKey(Seq("product_id"), "All products are unique"))
    assert(suite.checks(2) == NonNull(Seq("product_id"), "All products have a key"))
    assert(suite.checks(4) == RangeMin("unit_price", 0.0, "min_unit_price"))
  }

  test("a loaded suite evaluates like the equivalent hand-built suite") {
    val suite = SodaYaml.parse(yml)
    val got = Checks.evaluate(df, suite.checks).map(r => r.check_name -> (r.violations, r.passed)).toMap
    assert(got("schema_0") == ((0L, true)))
    assert(got("All products are unique") == ((1L, false)))       // p1 twice
    assert(got("All products have a key") == ((1L, false)))       // one null key
    assert(got("All weekdays are in range 0-6") == ((1L, false))) // weekday 8
    assert(got("min_unit_price") == ((1L, false)))                // -1.0
    assert(got("min_total_sold") == ((1L, false)))                // 0 <= 0
    assert(got("No free products") == ((1L, false)))              // p3

    // the loaded suite's results equal a hand-built equivalent suite's,
    // check for check (same semantics, hand-chosen names)
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val hand = Checks.evaluate(df, Seq(
      SchemaAndTypes(Seq("product_id", "description", "unit_price"),
        Map("product_id" -> StringType, "unit_price" -> DoubleType), "h_schema"),
      UniqueKey(Seq("product_id"), "h_unique"),
      NonNull(Seq("product_id"), "h_nonnull"),
      FailedRowsWhere(col("weekday") < 0 || col("weekday") > 6, "h_weekday"),
      RangeMin("unit_price", 0.0, "h_price"),
      FailedRowsWhere(col("total_sold") <= 0.0, "h_sold"),
      FailedRowsWhere(col("unit_price") === 0.0 && col("total_sold") > 0, "h_free")))
    val yaml = Checks.evaluate(df, suite.checks)
    assert(yaml.map(r => (r.violations, r.passed)) == hand.map(r => (r.violations, r.passed)))
  }

  test("loadDir reads every yml in a directory (runner shape)") {
    val dir = java.nio.file.Files.createTempDirectory("soda_checks")
    java.nio.file.Files.writeString(dir.resolve("a.yml"), yml)
    // b.yml: a bare item (no colon — the common SodaCL short form) and a
    // second suite in the same file (SodaCL allows several per file)
    java.nio.file.Files.writeString(dir.resolve("b.yml"),
      """checks for other:
        |  - missing_count(x) = 0
        |checks for third:
        |  - duplicate_count(y) = 0:
        |      name: y unique
        |""".stripMargin)
    val suites = SodaYaml.loadDir(dir.toString)
    assert(suites.map(_.table) == Seq("dim_product", "other", "third"))
    assert(suites(1).checks == Seq(NonNull(Seq("x"), "missing_x")))
    assert(suites(2).checks == Seq(UniqueKey(Seq("y"), "y unique")))
  }

  test("rejects constructs outside the supported subset") {
    intercept[IllegalArgumentException] {
      SodaYaml.parse("checks for t:\n  - freshness(ts) < 1d:\n")
    }
  }
}
