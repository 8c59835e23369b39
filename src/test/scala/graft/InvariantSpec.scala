package graft

import java.sql.Timestamp
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.models.Meta

/** Cross-cutting invariants: merge idempotence and the one-job guarantee
  * of the check evaluator (the scale claims, verified). */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("incrementalMerge is idempotent: re-running with the same source is a no-op") {
    val existing = Seq(("a", "2024-01-01", 1.0, ts("2024-01-01 00:00:00")))
      .toDF("ad_id", "date", "spend", "updated_at")
    val source = Seq(
      ("a", "2024-01-01", 2.0, ts("2024-01-02 00:00:00")),
      ("b", "2024-01-01", 3.0, ts("2024-01-03 00:00:00"))
    ).toDF("ad_id", "date", "spend", "updated_at")
    val once = Meta.incrementalMerge(existing, source, Seq("ad_id", "date"), tieBreak = Seq("ad_id"))
    val twice = Meta.incrementalMerge(once, source, Seq("ad_id", "date"), tieBreak = Seq("ad_id"))
    assert(once.orderBy("ad_id").collect().toSeq == twice.orderBy("ad_id").collect().toSeq)
  }

  test("Checks.evaluate runs exactly one Spark job for a mixed suite") {
    val df = (1 to 1000).map(i => (i.toLong, s"v${i % 7}", i * 1.5))
      .toDF("id", "name", "v")
    df.count() // warm the plan/files path outside the measured window

    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val results = Checks.evaluate(df, Seq(
        SchemaSuperset(Seq("id", "name")),
        RowCountMin(10),
        NonNull(Seq("name")),
        RangeMin("v", 0),
        AcceptedValues("name", (0 to 6).map(i => s"v$i"), name = "enum"),
        UniqueKey(Seq("id"), name = "uid"),
        UniqueKey(Seq.empty, name = "dup")))
      Thread.sleep(500) // let listener events drain (bus API is private)
      assert(results.forall(_.passed))
      // One action: AQE materializes its query stages as separate jobs
      // (partial/final/result ⇒ ~3), but a per-check implementation would
      // launch ≥ 2 jobs per UniqueKey + 1 per row-level group ⇒ ≥ 8.
      assert(jobs <= 3, s"expected a single-action evaluation (≤3 AQE stage jobs), saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
