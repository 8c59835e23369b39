package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MatViews

/** The summary-table rewrite must (1) actually fire — the optimized plan
  * scans the MV parquet (its `__cnt`/partial columns), not the fact —
  * (2) produce identical results to the fact-scan aggregate, including
  * under dim filters and dim-subset rollups, and (3) stand down on every
  * ineligible shape. */
class MatViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
  private lazy val factPath = s"$dir/fact"
  private lazy val mvPath = s"$dir/mv"

  private def setupOnce(): Unit = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    if (!new java.io.File(factPath).exists()) {
      // score is nullable WITH nulls so count/avg rewrites face real
      // null semantics; its values are small integers in double (ulp-safe)
      (1 to 1000).map(i => (s"f${i % 3}", s"s${i % 5}", i.toLong, i * 1.5,
          if (i % 4 == 0) None else Some((i % 10).toDouble)))
        .toDF("flag", "status", "qty", "price", "score")
        .write.parquet(factPath)
      MatViews.create(spark, factPath, dims = Seq("flag", "status"),
        measures = Seq("qty", "price", "score"), mvPath = mvPath)
    }
  }

  private def fact = spark.read.parquet(factPath)

  /** plan toString omits file paths — detect by the scanned relation's
    * columns: the MV scan carries the partial columns, the fact doesn't */
  private def scansMv(q: DataFrame): Boolean = {
    val rels = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.output.map(_.name).toSet
    }
    rels.nonEmpty && rels.forall(_.contains("__cnt"))
  }

  test("rewrites a full-dims aggregate to the MV scan with identical results") {
    setupOnce()
    val q = fact.groupBy($"flag", $"status")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sq"),
        min($"price").as("mn"), max($"price").as("mx"))
    assert(scansMv(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    // values equal a fresh unrewritten computation (registry cleared)
    MatViews.clear()
    val direct = fact.groupBy($"flag", $"status")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sq"),
        min($"price").as("mn"), max($"price").as("mx"))
      .collect().toSet
    MatViews.register(spark, factPath, mvPath, Seq("flag", "status"), Seq("qty", "price", "score"))
    assert(q.collect().toSet == direct)
  }

  test("dim-subset rollup and dim filter both rewrite exactly") {
    setupOnce()
    val q = fact.filter($"flag" =!= "f1").groupBy($"status")
      .agg(sum($"qty").as("sq"), count(lit(1)).as("n"))
    assert(scansMv(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    MatViews.clear()
    val direct = fact.filter($"flag" =!= "f1").groupBy($"status")
      .agg(sum($"qty").as("sq"), count(lit(1)).as("n")).collect().toSet
    MatViews.register(spark, factPath, mvPath, Seq("flag", "status"), Seq("qty", "price", "score"))
    assert(q.collect().toSet == direct)
  }

  test("ineligible shapes stand down: non-dim filter, distinct measure, dim count, measure grouping, global agg") {
    setupOnce()
    val shapes = Seq(
      fact.filter($"qty" > 10).groupBy($"flag").agg(sum($"qty")),   // filter on measure
      fact.groupBy($"flag").agg(countDistinct($"qty")),              // distinct over a measure
      fact.groupBy($"flag").agg(sum_distinct($"qty")),                // non-count distinct
      fact.groupBy($"flag").agg(count($"status")),                   // count over a dim
      fact.groupBy($"qty").agg(count(lit(1))),                       // group on measure
      fact.agg(sum($"qty"))                                          // global aggregate
    )
    shapes.foreach { q =>
      assert(!scansMv(q),
        s"should NOT have rewritten:\n${q.queryExecution.optimizedPlan}")
    }
  }

  test("count(measure) and avg(measure) rewrite with exact null semantics") {
    setupOnce()
    val q = fact.groupBy($"flag")
      .agg(count(lit(1)).as("n_rows"), count($"score").as("n_score"),
        avg($"score").as("avg_score"), avg($"qty").as("avg_qty"))
    assert(scansMv(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    MatViews.clear()
    val direct = fact.groupBy($"flag")
      .agg(count(lit(1)).as("n_rows"), count($"score").as("n_score"),
        avg($"score").as("avg_score"), avg($"qty").as("avg_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    MatViews.register(spark, factPath, mvPath, Seq("flag", "status"), Seq("qty", "price", "score"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSet
    assert(got == direct, s"mv $got != direct $direct")
    // nulls actually exercised: non-null count < row count
    assert(got.forall { case (_, n, ns, _, _) => ns < n })
  }

  test("multi-path scans and count(NULL) stand down") {
    setupOnce()
    val otherPath = s"$dir/other"
    if (!new java.io.File(otherPath).exists())
      Seq(("fX", "sX", 5L, 1.0, Option(1.0)))
        .toDF("flag", "status", "qty", "price", "score")
        .write.parquet(otherPath)
    // read.parquet(fact, other): one rootPath matches the registry, but
    // the scan holds rows the MV never saw — must NOT rewrite
    val multi = spark.read.parquet(factPath, otherPath)
      .groupBy($"flag").agg(count(lit(1)).as("n"))
    assert(!scansMv(multi),
      s"multi-path scan was rewritten:\n${multi.queryExecution.optimizedPlan}")
    assert(multi.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      .get("fX").contains(1L), "the unregistered path's rows must survive")
    // count(NULL) is foldable but nullable: 0 per group, not the row count
    val cn = fact.groupBy($"flag").agg(count(lit(null)).as("n"))
    assert(!scansMv(cn),
      s"count(NULL) was rewritten:\n${cn.queryExecution.optimizedPlan}")
    assert(cn.collect().forall(_.getLong(1) == 0L))
  }

  test("count(DISTINCT dim) rewrites exactly; count(DISTINCT measure) stands down") {
    setupOnce()
    val q = fact.groupBy($"flag")
      .agg(countDistinct($"status").as("n_status"), sum($"qty").as("sq"))
    assert(scansMv(q), s"distinct-dim count did not rewrite:\n${q.queryExecution.optimizedPlan}")
    MatViews.clear()
    val direct = fact.groupBy($"flag")
      .agg(countDistinct($"status").as("n_status"), sum($"qty").as("sq"))
      .collect().toSet
    MatViews.register(spark, factPath, mvPath, Seq("flag", "status"), Seq("qty", "price", "score"))
    assert(q.collect().toSet == direct)
    val bad = fact.groupBy($"flag").agg(countDistinct($"qty"))
    assert(!scansMv(bad),
      s"distinct over a MEASURE must stand down:\n${bad.queryExecution.optimizedPlan}")
  }

  test("streaming append IVM-maintains the registered MV end-to-end (runMvMaintainJob)") {
    import java.sql.Timestamp
    val base = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString
    val sFactPath = s"$base/fact"
    val sMvPath = s"$base/mv"
    def ev(id: Long, t: String, v: Double) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), id % 7, t, v, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // initial fact + its MV
    val initial = (1 to 300).map(i => ev(i.toLong, s"t${i % 3}", (i % 11).toDouble))
    initial.toDF(cols: _*).write.parquet(sFactPath)
    MatViews.create(spark, sFactPath, dims = Seq("event_type"),
      measures = Seq("value"), mvPath = sMvPath)
    // two delta files land in the stream inbox AND append to the fact
    val inDir = s"$base/inbox"
    val delta1 = (301 to 400).map(i => ev(i.toLong, s"t${i % 4}", (i % 13).toDouble))
    val delta2 = (401 to 450).map(i => ev(i.toLong, "t9", (i % 5).toDouble))
    (delta1 ++ delta2).toDF(cols: _*).write.mode("append").parquet(sFactPath)
    delta1.toDF(cols: _*).write.parquet(s"$inDir/d1")
    delta2.toDF(cols: _*).write.parquet(s"$inDir/d2")
    graft.streaming.EventsStream.runMvMaintainJob(spark, s"$inDir/*", sFactPath,
      sMvPath, s"$base/ckpt", dims = Seq("event_type"), measures = Seq("value"))
    // the maintained summary must make eligible aggregates over the
    // APPENDED fact rewrite AND stay exact
    val q = spark.read.parquet(sFactPath).groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"),
        min($"value").as("mn"), max($"value").as("mx"))
    assert(scansMv(q), s"maintained MV not used:\n${q.queryExecution.optimizedPlan}")
    MatViews.clear()
    val direct = q.collect().toSet // registry cleared: recomputes from the fact
    MatViews.register(spark, sFactPath, sMvPath, Seq("event_type"), Seq("value"))
    assert(q.collect().toSet == direct, "maintained MV diverged from the fact")
    // t9 exists only in the delta: maintenance genuinely folded new groups in
    assert(q.filter($"event_type" === "t9").count() == 1)
    MatViews.clear()
  }

  test("the registered misc_mv_rewrite query's plan scans the MV, not lineitem") {
    val q = SparkEntry.queries("misc_mv_rewrite")(spark, "/root/testdata/sf0.001")
    assert(scansMv(q), s"misc_mv_rewrite not rewritten:\n${q.queryExecution.optimizedPlan}")
  }

  override def afterAll(): Unit = { MatViews.clear(); super.afterAll() }
}
