package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning on the date-partitioned fact layout: the
  * misc_dpp_join scan must carry a runtime `dynamicpruning` partition
  * filter (no static filter can reach it — the months come from a
  * different relation) and must actually read 3 of the 84 ship-month
  * partitions, not the whole fact. */
class DppSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** materialize, then unwrap AQE (AdaptiveSparkPlanExec is a LEAF to
    * TreeNode.collect — the real operators live in its executedPlan) */
  private def run(q: DataFrame): (Array[org.apache.spark.sql.Row], SparkPlan) = {
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (rows, plan)
  }

  /** full traversal: AQE wrappers (AdaptiveSparkPlanExec,
    * QueryStageExec, ReusedExchangeExec) are leaves to TreeNode.collect
    * and hide their subtrees behind non-children fields */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allNodes(r.child)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def factScan(plan: SparkPlan, col: String): FileSourceScanExec = {
    val scans = allNodes(plan).collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.exists(_.name == col) => s
    }
    assert(scans.nonEmpty, s"no partitioned fact scan found in:\n$plan")
    scans.head
  }

  private def partitionsRead(scan: FileSourceScanExec): Option[Long] =
    scan.metrics.collectFirst {
      case (name, m) if name.toLowerCase.contains("partition") => m.value
    }

  test("the fact scan carries a dynamicpruning partition filter and reads only Q1-1995") {
    val (rows, plan) = run(SparkEntry.queries("misc_dpp_join")(spark, sfDir))
    val scan = factScan(plan, "ship_month")
    val pf = scan.partitionFilters.mkString("; ").toLowerCase
    assert(pf.contains("dynamicpruning"),
      s"fact scan has no dynamic pruning filter — partitionFilters: [$pf]\n$plan")
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("1995-01", "1995-02", "1995-03"))
    // the runtime subquery must have selected exactly the 3 Q1-1995
    // month directories at the scan
    val got = partitionsRead(scan)
    assert(got.contains(3L),
      s"expected 3 partitions read, metrics: ${scan.metrics.map { case (k, v) => s"$k=${v.value}" }}")
  }

  test("without the dim filter every partition is read (the pruning is real, not layout luck)") {
    val fact = spark.read.parquet(graft.queries.MiscQueries.dppFactPath(spark, sfDir))
    val (_, plan) = run(fact.groupBy(col("ship_month")).agg(count(lit(1))))
    val scan = factScan(plan, "ship_month")
    val got = partitionsRead(scan).orElse(
      scan.metrics.collectFirst { case (n, m) if n == "numFiles" => m.value })
    assert(got.exists(_ > 50L),
      s"unfiltered scan should read all ~84 partitions, metrics: " +
        s"${scan.metrics.map { case (k, v) => s"$k=${v.value}" }}")
  }
}
