package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump compressed physical-plan summaries for every registered
  * query — the "is this the plan I'd want at 100 TB" review loop. Greps
  * for the load-bearing operators: join strategies, scans (pushdown +
  * pruned schema), exchanges, codegen spans.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [queryName…]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        println(s"======== $name")
        try fn(spark, dir).queryExecution.executedPlan.toString.split("\n")
          .filter(l => l.contains("Join") || l.contains("Scan parquet") ||
            l.contains("Exchange") || l.contains("TakeOrdered") ||
            l.contains("InMemoryRelation"))
          .take(30).foreach(l => println(l.take(240)))
        catch { case e: Throwable => println(s"  plan failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
