package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns._

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("commaDecimal parses decimal-comma strings (F1)") {
    val out = Seq("12,34", "0,5", "7").toDF("x")
      .select(commaDecimal($"x").as("v")).as[Double].collect()
    assert(out.toSeq == Seq(12.34, 0.5, 7.0))
  }

  test("surrogateKey matches dbt_utils generate_surrogate_key semantics (F15)") {
    // md5 of 'a-b'; null coalesces to '' (md5 of '1-')
    val out = Seq(("a", Some("b")), ("1", None)).toDF("x", "y")
      .select(surrogateKey($"x", $"y").as("k")).as[String].collect()
    assert(out(0) == java.security.MessageDigest.getInstance("MD5")
      .digest("a-b".getBytes).map("%02x".format(_)).mkString)
    assert(out(1) == java.security.MessageDigest.getInstance("MD5")
      .digest("1-".getBytes).map("%02x".format(_)).mkString)
  }

  test("normName strips non-alphanumerics and lowers (F4)") {
    val out = Seq("RTL-Nitro", "rtl nitro", "Super RTL", "SUP RTL").toDF("x")
      .select(normName($"x").as("v")).as[String].collect()
    assert(out(0) == "rtlnitro" && out(1) == "rtlnitro") // match pair
    assert(out(2) == "superrtl" && out(3) == "suprtl")   // non-match pair
  }

  test("blockCode reformats 8-digit codes (F5)") {
    val out = Seq("12345678", "abc").toDF("x")
      .select(blockCode($"x").as("v")).as[String].collect()
    assert(out.toSeq == Seq("12-34-56-78", "abc"))
  }

  test("parseInvoiceTs dispatches on length, null on unknown shape (F10)") {
    val out = Seq("01/02/2011 03:04", "1/2/11 3:04", "garbage-len-15x")
      .toDF("x").select(parseInvoiceTs($"x").cast("string").as("v"))
      .collect().map(_.getString(0))
    assert(out(0) == "2011-01-02 03:04:00")
    assert(out(1) == "2011-01-02 03:04:00")
    assert(out(2) == null)
  }

  test("md5u64 equals DuckDB md5_number_lower") {
    // duckdb: select md5_number_lower('abc') = 8250560606382298838
    val out = Seq("abc").toDF("x").select(md5u64($"x").cast("string").as("v"))
      .as[String].collect()
    assert(out(0) == "8250560606382298838")
  }

  test("native Md5Fold matches the composed md5u64 chain and DuckDB md5_number_*") {
    val df = Seq("abc", "the quick brown", "", "Straße 42").toDF("x")
    // lo58 == md5u64 % 2^58; hi58 == md5u64Upper % 2^58 (decimal reference path)
    val rows = df.select(
      md5lo58($"x").as("lo"), md5hi58($"x").as("hi"), md5long63($"x").as("l63"),
      (md5u64($"x") % lit(BigDecimal(1L << 58))).cast("long").as("lo_ref"),
      (md5u64Upper($"x") % lit(BigDecimal(1L << 58))).cast("long").as("hi_ref"),
      (md5u64($"x") % lit(BigDecimal("9223372036854775808"))).cast("long").as("l63_ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(3) && r.getLong(1) == r.getLong(4)
        && r.getLong(2) == r.getLong(5), r.toString)
    }
    // duckdb: select md5_number_upper('abc') = 12704604231530709392;
    // 12704604231530709392 % 2^58 = 12704604231530709392 & (2^58-1)
    val abc = rows(0)
    assert(abc.getLong(1) == (java.lang.Long.parseUnsignedLong("12704604231530709392") & ((1L << 58) - 1)))
  }

  test("guardedEnum keeps allowed values, defaults the rest (F6)") {
    val out = Seq("CRM", "Nope", null).toDF("x")
      .select(guardedEnum($"x", Seq("Classical", "CRM", "Digital"), "Other").as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("CRM", "Other", "Other"))
  }
}
