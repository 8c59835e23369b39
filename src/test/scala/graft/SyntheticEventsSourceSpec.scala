package graft

import org.apache.spark.sql.functions._

/** The DSv2 connector contract: deterministic rows, real parallelism
  * (one task per planned range), column pruning, and event_id range
  * pushdown that narrows GENERATION (not post-filtering) — plus exact
  * agreement between pushed and unpushed evaluation. */
class SyntheticEventsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: Long, partitions: Int = 4) =
    spark.read.format("graft-events")
      .option("rows", rows).option("partitions", partitions).load()

  test("produces exactly `rows` deterministic rows across `partitions` tasks") {
    val df = feed(1000, 4)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
    // deterministic: two separate reads agree bit-for-bit
    val a = df.orderBy("event_id").collect()
    val b = feed(1000, 7).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq) // partitioning must not change content
    assert(a.head.getAs[Long]("event_id") == 0L)
    assert(a(1).getAs[java.sql.Timestamp]("ts").getTime ==
      a.head.getAs[java.sql.Timestamp]("ts").getTime + 1000L)
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val q = feed(100).select($"user_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("user_id") && !scan.contains("props"),
      s"pruning did not reach the scan:\n$scan")
    assert(q.distinct().count() <= 100)
  }

  test("event_id range predicates push into generation; residuals stay with Spark") {
    val q = feed(1000).filter($"event_id" >= 900L && $"event_id" < 950L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[900,950)"),
      s"pushdown did not narrow the generated range:\n$plan")
    assert(q.count() == 50)
    // equality collapses to a 1-row range
    val one = feed(1000).filter($"event_id" === 123L)
    assert(one.queryExecution.executedPlan.toString.contains("range=[123,124)"))
    assert(one.count() == 1)
    // a non-id predicate is NOT pushed (stays a residual filter) but
    // still evaluates correctly
    val res = feed(1000).filter($"event_type" === "view")
    val resPlan = res.queryExecution.executedPlan.toString
    assert(resPlan.contains("range=[0,1000)"), s"over-pushed:\n$resPlan")
    val direct = feed(1000).collect()
      .count(_.getAs[String]("event_type") == "view")
    assert(res.count() == direct)
  }

  test("ungrouped count/min/max push COMPLETELY to the source; grouped and non-id aggs decline") {
    val q = feed(5000, 8).filter($"event_id" >= 1000L && $"event_id" < 4000L)
      .agg(count(lit(1)).as("n"), min($"event_id").as("mn"), max($"event_id").as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[count(*), min(event_id), max(event_id)]"),
      s"aggregates not pushed:\n$plan")
    assert(q.as[(Long, Long, Long)].head() == ((3000L, 1000L, 3999L)))
    // pushed == unpushed: row-by-row recompute over the plain scan
    val rows = feed(5000, 8).collect().map(_.getAs[Long]("event_id"))
      .filter(id => id >= 1000L && id < 4000L)
    assert((rows.length.toLong, rows.min, rows.max) == ((3000L, 1000L, 3999L)))
    // empty range: count 0, null min/max (global-aggregate semantics)
    val empty = feed(5000).filter($"event_id" < 0L)
      .agg(count(lit(1)), min($"event_id"), max($"event_id")).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
    // grouped: declines, values still correct
    val grouped = feed(1000).groupBy($"event_type").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(grouped.collect().map(_.getAs[Long]("n")).sum == 1000L)
    // non-id column: declines, falls back to the row scan
    val other = feed(1000).agg(min($"user_id").as("m"))
    assert(!other.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(other.head().getLong(0) ==
      feed(1000).collect().map(_.getAs[Long]("user_id")).min)
  }

  test("pushed and unpushed evaluation agree on a mixed predicate") {
    val pushedQ = feed(2000)
      .filter($"event_id" >= 500L && $"event_id" <= 1499L && $"user_id" % 7 === 0L)
    val unpushed = feed(2000).collect().filter { r =>
      val id = r.getAs[Long]("event_id")
      id >= 500 && id <= 1499 && r.getAs[Long]("user_id") % 7 == 0
    }
    assert(pushedQ.count() == unpushed.length)
  }

  test("LIMIT folds into the generated range; composes with filter pushdown") {
    val q = feed(100000, 8).limit(25)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,25)"),
      s"limit did not narrow the generated range:\n$plan")
    assert(q.count() == 25)
    // after an id-range pushdown the limit caps the NARROWED range
    val fq = feed(100000, 8).filter($"event_id" >= 5000L).limit(10)
    val fplan = fq.queryExecution.executedPlan.toString
    assert(fplan.contains("range=[5000,5010)"),
      s"limit did not compose with the pushed filter:\n$fplan")
    assert(fq.collect().map(_.getAs[Long]("event_id")).sorted.toSeq ==
      (5000L until 5010L).toSeq)
    // a limit larger than the domain is a no-op
    assert(feed(50).limit(500).count() == 50)
  }

  test("ORDER BY event_id ASC LIMIT n pushes as partial TopN; other orders decline") {
    val q = feed(100000, 8).orderBy($"event_id").limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,7)"),
      s"topN did not narrow the generated range:\n$plan")
    assert(q.collect().map(_.getAs[Long]("event_id")).toSeq == (0L until 7L).toSeq)
    // DESC order cannot fold into the ascending generator: full range stays
    val desc = feed(1000, 4).orderBy($"event_id".desc).limit(3)
    assert(desc.queryExecution.executedPlan.toString.contains("range=[0,1000)"))
    assert(desc.collect().map(_.getAs[Long]("event_id")).toSeq ==
      Seq(999L, 998L, 997L))
  }

  test("micro-batch streaming read: admission-controlled batches, exactly-once resume") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ck").toString
    def run(rows: Long): Unit = {
      val q = spark.readStream.format("graft-events")
        .option("rows", rows).option("partitions", 3).option("batchRows", 400)
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive, "stream did not drain within the timeout")
    }
    run(1000)
    val first = spark.read.parquet(out)
    assert(first.count() == 1000)
    assert(first.select($"event_id").distinct().count() == 1000)
    // the feed grows; a restart from the checkpoint emits ONLY the delta
    run(1500)
    val second = spark.read.parquet(out)
    assert(second.count() == 1500, "resume re-emitted or skipped rows")
    assert(second.select($"event_id").distinct().count() == 1500)
    // streaming content == batch content (same pure-function generator)
    val batch = feed(1500).selectExpr("sum(event_id)", "sum(user_id)").head()
    val stream = second.selectExpr("sum(event_id)", "sum(user_id)").head()
    assert(batch == stream)
  }
}
