package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Classic warehouse analytics over the harness star schema (TPC-H-shaped
  * pricing summary / shipping-priority / local-volume queries) — general
  * OLAP capability beyond the reference's own models, and the canonical
  * shapes the engine must keep fast at scale: partial-agg group-bys,
  * broadcast-dim joins over a large fact, decimal-exact money math.
  *
  * Decimal discipline (cross-engine exact): money doubles are cast to
  * DECIMAL(18,2) per row (tie-free — inputs are 2-dec values), products
  * keep their full scale, sums aggregate in DECIMAL (exact, order-
  * independent) — but every OUTPUT column is DOUBLE (the decimal→double
  * cast is correctly rounded in both engines; DECIMAL outputs are
  * normalized differently by downstream decimal→float conversions).
  * Averages divide the sum-double by the count-double (identical IEEE
  * division) — never a decimal division, whose scale/rounding rules
  * differ per engine.
  */
object TpchQueries {

  private def dec2(c: String) = col(c).cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-shaped pricing summary: scan-heavy partial+final aggregation.
    "tpch_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2("l_quantity")).cast(DoubleType).as("sum_qty"),
          sum(dec2("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
          sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order").cast(DoubleType))
        .withColumn("avg_price", col("sum_base_price") / col("count_order").cast(DoubleType))),

    // Q3-shaped shipping priority: selective dim filter -> fact join ->
    // grouped revenue -> deterministic top-k.
    "tpch_top_orders" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast(TimestampType))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Q5-shaped local-supplier volume: 6-way star join, region-filtered,
    // revenue per nation. Dims broadcast; the two fact-side tables join
    // on their keys.
    "tpch_regional_volume" -> ((s, d) => {
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, d).join(broadcast(asia),
        col("n_regionkey") === col("r_regionkey"))
      val supp = Tables.supplier(s, d)
      val cust = Tables.customer(s, d)
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
          .cast(DoubleType).as("revenue"))
    }),

    // Q4-shaped priority check: EXISTS → left-semi join with a composite
    // (equi + range) condition — orders with any line shipped more than
    // 90 days after the order date.
    "tpch_late_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(s, d)
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q14-shaped promo share: conditional decimal aggregation (sum over a
    // CASE with no ELSE — nulls drop out of the sum identically in both
    // engines); the share divides the two DOUBLE-cast sums, the one IEEE
    // shape that is engine-stable.
    "tpch_promo_revenue" -> ((s, d) => {
      val product =
        dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-03-01 00:00:00").cast(TimestampType))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", product)).cast(DoubleType).as("promo_revenue"),
          sum(product).cast(DoubleType).as("total_revenue"))
        .withColumn("promo_share",
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
    }),

    // Q10-shaped returned-item report: 4-way star join over the returned
    // slice, per-customer revenue, deterministic top-20.
    "tpch_returned_customers" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)),

    // Q19-shaped bracketed predicate: equi join + an OR-of-ANDs residual
    // mixing columns from BOTH sides — the disjunction Catalyst keeps as
    // a post-join filter while still hashing the equi key.
    "tpch_bracketed_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 30))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
            .cast(DoubleType).as("revenue"))),

    // Q6-shaped forecast: pure filter-aggregate, no join — the predicate
    // trio pushes to the scan; revenue aggregates exactly (the 2dp ×
    // 2dp product is an exact 4dp decimal).
    "tpch_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType) &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec2("l_extendedprice") * dec2("l_discount"))
            .cast(DoubleType).as("revenue"))),

    // Q13-shaped order-count distribution: LEFT join so zero-order
    // customers land in the 0 bucket, then a histogram of the counts —
    // the two-level aggregation shape.
    "tpch_order_distribution" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // Q15-shaped top supplier: per-supplier quarterly revenue, then the
    // max-revenue row(s) via rank() over the SUPPLIER-cardinality frame
    // (a dim-sized window, not a fact-sized one) — ties all kept, like
    // the spec's `= max(total_revenue)` subquery.
    "tpch_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-04-01 00:00:00").cast(TimestampType))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
          .cast(DoubleType).as("total_revenue"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("total_revenue").desc)
      rev.join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .withColumn("__rk", rank().over(w))
        .filter(col("__rk") === 1)
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q22-shaped sales opportunity: rich customers (above the positive-
    // balance mean — an exact DECIMAL sum divided as DOUBLE, never a
    // bare double avg whose summation order differs per engine) with no
    // RECENT orders (anti join on the filtered fact; every harness
    // customer has SOME order, so recency is what makes the anti join
    // bite), grouped by nation.
    "tpch_sales_opportunity" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val threshold = broadcast(cust.filter(col("c_acctbal") > 0)
        .agg((sum(dec2("c_acctbal")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_bal")))
      cust.crossJoin(threshold)
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast(TimestampType))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec2("c_acctbal")).cast(DoubleType).as("totacctbal"))
    }),

    "tpch_min_cost_supplier" -> ((s, d) => minCostSql(s, d)),
    "tpch_bilateral_volume" -> ((s, d) => bilateralVolume(s, d))
  )

  /** Correlated-subquery shape (min-cost supplier per part, Q2-like):
    * written as SQL text so Catalyst's subquery decorrelation
    * (RewriteCorrelatedScalarSubquery) does the planning — the point is
    * that the engine takes declarative correlated SQL and produces a
    * join+agg plan, not that we hand-write the join. */
  private def minCostSql(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("li_v")
    spark.sql("""
      SELECT l_partkey, l_suppkey, l_extendedprice AS min_price
      FROM li_v l1
      WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM li_v l2
                               WHERE l2.l_partkey = l1.l_partkey)""")
  }

  /** Q7-like bilateral volume: two-nation shipping pairs by year. */
  private def bilateralVolume(spark: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(spark, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("supp_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("cust_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(dec2("l_extendedprice") * (lit(BigDecimal(1).setScale(2)) - dec2("l_discount")))
        .cast(DoubleType).as("volume"))
  }

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  val oracle: Map[String, String] = Map(
    "tpch_late_orders" -> """
SELECT o_orderpriority, count(*) AS order_count
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority""",

    "tpch_promo_revenue" -> s"""
SELECT promo_revenue, total_revenue,
       (CAST(100 AS DOUBLE) * promo_revenue) / total_revenue AS promo_share
FROM (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPrice END) AS DOUBLE) AS promo_revenue,
         CAST(sum($discPrice) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00')""",

    "tpch_returned_customers" -> s"""
SELECT c_custkey, c_name, n_name, revenue FROM (
  SELECT c_custkey, c_name, n_name, CAST(sum($discPrice) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name)
ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "tpch_bracketed_revenue" -> s"""
SELECT count(*) AS n_lines, CAST(sum($discPrice) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)""",

    "tpch_forecast_revenue" -> s"""
SELECT count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= CAST('0.05' AS DOUBLE) AND l_discount <= CAST('0.07' AS DOUBLE)
  AND l_quantity < 24""",

    "tpch_order_distribution" -> """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count""",

    "tpch_top_supplier" -> s"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum($discPrice) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",

    "tpch_sales_opportunity" -> """
WITH t AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN t
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name""",

    "tpch_pricing_summary" -> s"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum($discPrice) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",

    "tpch_top_orders" -> s"""
SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderpriority,
       CAST(sum($discPrice) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10""",

    "tpch_regional_volume" -> s"""
SELECT n.n_name,
       CAST(sum($discPrice) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name""",

    "tpch_min_cost_supplier" -> """
SELECT l_partkey, l_suppkey, l_extendedprice AS min_price
FROM lineitem l1
WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = l1.l_partkey)""",

    "tpch_bilateral_volume" -> s"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum($discPrice) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)"""
  )
}
