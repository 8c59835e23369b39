package graft
import org.apache.spark.sql.SparkSession
import graft.models.{Retail, TestdataAdapter}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    // no cache
    time("fct_nocache") { Retail.fctInvoices(TestdataAdapter.rawInvoices(spark, dir), TestdataAdapter.country(spark, dir)).count() }
    time("fct_nocache_2nd") { Retail.fctInvoices(TestdataAdapter.rawInvoices(spark, dir), TestdataAdapter.country(spark, dir)).count() }
    // with cache
    val raw = TestdataAdapter.rawInvoices(spark, dir).cache()
    time("raw_cache_materialize") { raw.count() }
    time("fct_cached") { Retail.fctInvoices(raw, TestdataAdapter.country(spark, dir)).count() }
    time("fct_cached_2nd") { Retail.fctInvoices(raw, TestdataAdapter.country(spark, dir)).count() }
    time("report_customer_cached") {
      Retail.reportCustomerInvoices(Retail.fctInvoices(raw, TestdataAdapter.country(spark, dir)),
        Retail.dimCustomer(raw, TestdataAdapter.country(spark, dir))).count()
    }
    spark.stop()
  }
}
