package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar column helpers re-expressing the reference's BigQuery/dbt scalar
  * surface (SURVEY.md §2.8) as codegen-friendly Spark built-ins. No UDFs:
  * every helper composes `org.apache.spark.sql.functions`, so the whole
  * thing stays inside whole-stage codegen.
  */
object Fns {

  /** F1 — decimal-comma → dot then numeric cast. DOUBLE, matching the
    * reference's `cast(replace(spend, ',', '.') as float64)` — and the only
    * cross-engine-stable choice: a decimal string parses to the identical
    * nearest double in Spark and DuckDB, while DECIMAL outputs survive
    * engine-specific decimal→float normalization downstream.
    * Reference: include/dbt/models/taico/meta/fb_meta_ads_transformed.sql:11-14
    * and include/dbt/models/data_cleaning/cleaned_data.sql:20-24. */
  def commaDecimal(c: Column): Column =
    regexp_replace(c, ",", ".").cast(DoubleType)

  /** F15 — dbt_utils.generate_surrogate_key (dbt_utils 1.1.1): md5 of the
    * '-'-joined, null-coalesced string casts of the key columns.
    * Reference: include/dbt/models/transform/dim_customer.sql:6,
    * dim_product.sql:5, fct_invoices.sql:8-9; packages.yml:3-4. */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast(StringType), lit(""))): _*))

  /** F4 — publisher-name normalization: strip all non-alphanumerics, lower.
    * Reference: include/dbt/models/mms/google_sheets/staging/
    * staging_performance_cost_combined.sql:40-50. */
  def normName(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9]", ""))

  /** F5 — 8-digit block-code reformat 'aabbccdd' → 'aa-bb-cc-dd' via regex
    * capture groups (Java `$n` refs, BigQuery used `\n`).
    * Reference: include/dbt/models/mms/google_sheets/staging/mms_lb_staged.sql:16. */
  def blockCode(c: Column): Column =
    regexp_replace(c, "(\\d{2})(\\d{2})(\\d{2})(\\d{2})", "$1-$2-$3-$4")

  /** F10 — two-format invoice timestamp parse chosen by string length
    * (16 → padded `MM/dd/yyyy HH:mm`, ≤14 → unpadded `M/d/yy H:mm`, else null).
    * Reference: include/dbt/models/transform/dim_datetime.sql:7-16. */
  def parseInvoiceTs(c: Column): Column =
    when(length(c) === 16, to_timestamp(c, "MM/dd/yyyy HH:mm"))
      .when(length(c) <= 14, to_timestamp(c, "M/d/yy H:mm"))

  /** Doubles rendered as money strings must go through decimal so the text
    * form is locale/engine-stable ("901.00", not "901.0"). Used wherever a
    * double participates in a surrogate key (F15 + F2 cast semantics). */
  def moneyStr(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale)).cast(StringType)

  /** Lower 64 bits of md5(input) read little-endian, as an unsigned
    * DECIMAL(20,0). Bit-for-bit equal to DuckDB's `md5_number_lower`, which
    * makes hash-dependent operators (MinHash, SimHash) oracle-checkable.
    * `conv` interprets 16 hex chars as an unsigned 64-bit value. */
  def md5u64(c: Column): Column = md5u64At(c, 17)

  /** Upper 64 bits (digest bytes 0..7, little-endian) — DuckDB's
    * `md5_number_upper`. */
  def md5u64Upper(c: Column): Column = md5u64At(c, 1)

  private def md5u64At(c: Column, hexStart: Int): Column = {
    val hex = md5(c)
    // little-endian ⇒ reverse the byte pairs
    val le = concat((0 until 8).reverse.map(i => substring(hex, hexStart + 2 * i, 2)): _*)
    conv(le, 16, 10).cast(DecimalType(20, 0))
  }

  /** md5u64 folded into a non-negative signed 63-bit Long (mod 2^63) so
    * bitwise ops (&, ^, bit_count) stay in native LongType codegen.
    * Backed by the native Md5Fold expression (one digest + integer ops;
    * the composed hex→conv→decimal chain, kept as md5u64 above, is the
    * reference implementation FnsSpec cross-checks against). */
  def md5long63(c: Column): Column = org.apache.spark.sql.graft.Md5Fold.lo(c, 63)

  /** 58-bit folds of the two md5 halves. One md5 per input yields a 2-seed
    * tabulation family h_i(x) = lo58 + i*hi58 that stays inside signed-64
    * arithmetic for i ≤ 15 (16*2^58 < 2^63) — ANSI-overflow-safe in Spark
    * and reproducible in DuckDB from md5_number_lower/upper. */
  def md5lo58(c: Column): Column = org.apache.spark.sql.graft.Md5Fold.lo(c, 58)
  def md5hi58(c: Column): Column = org.apache.spark.sql.graft.Md5Fold.hi(c, 58)

  /** F6-style guarded enum remap: keep values in `allowed`, else `other`.
    * Reference: fb_meta_ads_transformed.sql:48-51 (media_cluster IN-guard). */
  def guardedEnum(c: Column, allowed: Seq[String], other: String): Column =
    when(c.isin(allowed: _*), c).otherwise(lit(other))
}
