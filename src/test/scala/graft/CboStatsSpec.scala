package graft

import org.apache.spark.sql.functions._

/** Table/column statistics as an engine surface: ANALYZE TABLE feeds
  * rowCount + column NDV/min-max into Catalyst, and with CBO + join
  * reorder enabled the optimizer re-orders a badly-written join so the
  * selective dimension prunes first — the 100 TB behavior (join order
  * chosen by measured cardinality, not query text) demonstrated on the
  * harness star schema. */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ensureTables(): Unit = synchronized {
    if (!spark.catalog.tableExists("cbo_lineitem")) {
      for (t <- Seq("lineitem", "orders", "customer")) {
        spark.read.parquet(s"$dir/$t.parquet")
          .write.mode("overwrite").saveAsTable(s"cbo_$t")
        spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }
  }

  private def withCbo[T](on: Boolean)(f: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, on.toString))
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // the join order actually planned, as the leaf-table sequence of the
  // first (deepest) join
  private def scanOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
      .map { s =>
        Seq("lineitem", "orders", "customer").find(t => s.contains(s"cbo_$t")).getOrElse("?")
      }

  test("ANALYZE records rowCount and column stats the optimizer can see") {
    ensureTables()
    // rowCount reaches plan stats through the CBO visitor; the default
    // size-only estimator ignores it by design
    val stats = withCbo(true) {
      spark.table("cbo_lineitem").queryExecution.optimizedPlan.stats
    }
    assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0)
    val cat = spark.sql("DESC EXTENDED cbo_orders o_orderkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cat("distinct_count").toLong > 0, s"no NDV recorded: $cat")
  }

  test("CBO reorders a text-order join so the selective dimension prunes first") {
    ensureTables()
    // written WORST-first: the two big tables joined before the filtered
    // dim. A rule-based planner keeps this left-deep text order.
    val sql = """
      SELECT count(*) AS n
      FROM cbo_lineitem l
      JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
      JOIN cbo_customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = 3"""
    val (offOrder, offN) = withCbo(false) {
      val df = spark.sql(sql); (scanOrder(df), df.head().getLong(0))
    }
    val (onOrder, onN) = withCbo(true) {
      val df = spark.sql(sql); (scanOrder(df), df.head().getLong(0))
    }
    assert(onN == offN, "reorder changed the answer")
    assert(offOrder == Seq("lineitem", "orders", "customer"),
      s"expected text order without CBO, got $offOrder")
    assert(onOrder != offOrder,
      s"CBO did not reorder the join (stats missing?): $onOrder")
    // the selective customer⋈orders pair must join before lineitem
    assert(onOrder.indexOf("lineitem") > 0,
      s"big fact still first after reorder: $onOrder")
  }
}
