package graft

import org.apache.spark.sql.functions._
import graft.checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, Some("a"), 10.0, 5.0),
    (2, Some("a"), -1.0, 2.0),  // range violation; cost < cpc violation
    (3, None, 3.0, 1.0),        // null name
    (3, Some("c"), 4.0, 1.0)    // duplicate id
  ).toDF("id", "name", "cost", "cpc")

  test("NonNull counts null rows (Q3/Q6)") {
    val r = Checks.evaluate(df, Seq(NonNull(Seq("name"))))
    assert(r.head == CheckResult("non_null", 1, passed = false))
  }

  test("UniqueKey counts duplicates beyond first per key (Q7/A8)") {
    val r = Checks.evaluate(df, Seq(UniqueKey(Seq("id"), name = "uid")))
    assert(r.head == CheckResult("uid", 1, passed = false))
  }

  test("full-row duplicate check (Q4)") {
    val d2 = df.union(df.limit(1))
    val r = Checks.evaluate(d2, Seq(UniqueKey(Seq.empty, name = "dup")))
    assert(r.head == CheckResult("dup", 1, passed = false))
  }

  test("RowCountMin (Q2/A7)") {
    val r = Checks.evaluate(df, Seq(RowCountMin(100, name = "mn")))
    assert(r.head == CheckResult("mn", 96, passed = false))
    assert(Checks.evaluate(df, Seq(RowCountMin(4))).head.passed)
  }

  test("RangeMin / ColumnGte (Q9)") {
    val r = Checks.evaluate(df, Seq(
      RangeMin("cost", 0, name = "pos"), ColumnGte("cost", "cpc", name = "gte")))
    assert(r(0) == CheckResult("pos", 1, passed = false))
    assert(r(1) == CheckResult("gte", 1, passed = false))
  }

  test("schema checks need no job (Q1/Q5) and typed columns (Q9)") {
    val r = Checks.evaluate(df, Seq(
      SchemaSuperset(Seq("id", "name")),
      SchemaExact(Seq("id", "name", "cost", "cpc"), name = "exact"),
      SchemaExact(Seq("id"), name = "bad_exact"),
      TypedColumns(Map("id" -> org.apache.spark.sql.types.IntegerType))))
    assert(r.map(_.passed) == Seq(true, true, false, true))
  }

  test("AcceptedValues (Q12/A9)") {
    val r = Checks.evaluate(df, Seq(AcceptedValues("name", Seq("a"), name = "av")))
    // 'c' invalid; null is not counted (SQL three-valued logic, as in dbt)
    assert(r.head == CheckResult("av", 1, passed = false))
  }

  test("failedRows returns the violating rows (Q11)") {
    val rows = Checks.failedRows(df, FailedRowsWhere($"cost" < 0)).collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 2)
  }

  test("setSyncDiff reports both directions (Q8/U2)") {
    val src = Seq("a", "b", "c").toDF("v")
    val tgt = Seq("b", "c", "d").toDF("w")
    val out = Checks.setSyncDiff(src, "v", tgt, "w")
      .as[(String, String)].collect().toSet
    assert(out == Set("a" -> "missing_in_target", "d" -> "extra_in_target"))
  }

  test("Profiler.profile computes nulls/ndv/extrema per column in one pass") {
    val t = Seq(
      (1L, Some("x"), Some(2.0)),
      (2L, Some("y"), Some(5.0)),
      (3L, None, Some(2.0)),
      (4L, Some("x"), None)
    ).toDF("id", "s", "d")
    val p = graft.checks.Profiler.profile(t, Seq("id", "s", "d"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "x", "y")))
    assert(p("d") == ((4L, 1L, 2L, "2", "5"))) // double extrema render through BIGINT
    // the scale path swaps exact ndv for HLL++; same shape, sketched counts
    val approx = graft.checks.Profiler.profile(t, Seq("id"), exactNdv = false).collect()
    assert(approx.head.getLong(3) > 0L)
  }

  test("observedChecks: the writing job itself computes the suite, no second scan") {
    val suite = Seq(
      RowCountMin(4, name = "mn"),
      NonNull(Seq("name"), name = "nn"),
      RangeMin("cost", 0, name = "pos"),
      ColumnGte("cost", "cpc", name = "gte"),
      UniqueKey(Seq("id"), name = "uid"),
      SchemaSuperset(Seq("id", "name"), name = "ss"))
    val (observed, handle) = Checks.observedChecks(df, suite)
    // the metrics ride the plan as CollectMetrics — structurally no
    // separate aggregation job
    assert(observed.queryExecution.analyzed.toString.contains("CollectMetrics"),
      observed.queryExecution.analyzed.toString)
    // one action (the pipeline's own write) materializes frame AND metrics
    val out = java.nio.file.Files.createTempDirectory("graft_obs").toString + "/t"
    observed.write.parquet(out)
    assert(spark.read.parquet(out).count() == 4) // payload untouched
    val inflight = handle.results().map(r => r.check_name -> r).toMap
    // exact in flight: row count, row-level sums, schema metadata
    val exact = Checks.evaluate(df, suite).map(r => r.check_name -> r).toMap
    for (k <- Seq("mn", "nn", "pos", "gte", "ss")) assert(inflight(k) == exact(k), k)
    // UniqueKey is advisory (HLL++), exact at this cardinality
    assert(inflight("uid") == exact("uid"))
  }

  test("stagingDataChecks composite matches reference validator shape (Q9)") {
    val staging = Seq(
      (1L, "2024-01-01", "tv", "c1", 5, 10, 2.0, 1.0, 10.0),
      (2L, "2024-01-01", "tv", "c1", -1, 10, 0.5, 1.0, 0.1)
    ).toDF("id", "date", "channel", "campaign", "clicks", "impressions",
      "media_cost_eur", "cpc", "revenue")
    val r = Checks.evaluate(staging, Checks.stagingDataChecks())
    val byName = r.map(c => c.check_name -> c.violations).toMap
    assert(byName("clicks_gte_0") == 1)   // -1 clicks
    assert(byName("cost_gte_cpc") == 1)   // 0.5 < 1.0
    assert(byName("revenue_gte_cost") == 1) // 0.1 < 0.5
    assert(byName("unique_id") == 0)
  }
}
