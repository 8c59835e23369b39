package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Drives the Structured Streaming pipelines through a real MemoryStream
  * micro-batch execution (not just the batch twins). */
class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyByType aggregates tumbling windows on a real stream (I1 streaming flavor)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val events = ms.toDF()
      .toDF("event_id", "ts", "event_type", "value")
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val q = EventsStream.hourlyByType(events).writeStream
      .format("memory").queryName("hourly_test").outputMode("complete").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:05:00"), "click", 1.5),
        (2L, ts("2024-01-01 10:55:00"), "click", 2.5),
        (3L, ts("2024-01-01 11:05:00"), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .orderBy("hour_ts", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(0).getAs[Double]("total_value") == 4.0)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("observedChecksStreaming: per-micro-batch DQ verdicts ride the query, no extra pass") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "event_type", "value")
    val suite = Seq(
      graft.checks.NonNull(Seq("event_type"), name = "nn"),
      graft.checks.RangeMin("value", 0.0, name = "pos"),
      graft.checks.RowCountMin(1, name = "mn"))
    val observed = graft.checks.Checks.observedChecksStreaming(events, suite, "dq")
    val q = observed.writeStream.format("memory").queryName("obs_dq_test").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00"), "click", 1.5),
        (2L, ts("2024-01-01 10:01:00"), "view", -3.0)) // one range violation
      q.processAllAvailable()
      val prog = q.recentProgress.reverse.find(_.observedMetrics.containsKey("dq")).get
      val res = graft.checks.Checks.resultsFromMetrics(
        prog.observedMetrics.get("dq"), suite, events.schema)
        .map(r => r.check_name -> r).toMap
      assert(res("nn").passed && res("mn").passed)
      assert(!res("pos").passed && res("pos").violations == 1L)
      // rows flow through untouched
      assert(spark.table("obs_dq_test").count() == 2)
    } finally q.stop()
  }

  test("runDedupJob: file source -> sink with checkpoint, exactly-once on restart") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, "{}"), // dup key
      (3L, ts("2024-01-01 10:20:00"), 8L, "view", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")

    EventsStream.runDedupJob(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == 2)

    // restart with the same checkpoint: nothing reprocessed, no duplicates
    EventsStream.runDedupJob(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("runQuarantineIngestJob routes violating rows to the dead-letter lane with verdicts in flight") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_quar").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, null.asInstanceOf[String], 2.0, "{}"), // null type
      (3L, ts("2024-01-01 10:20:00"), 8L, "view", -3.0, "{}"), // negative value
      (4L, ts("2024-01-01 10:30:00"), 9L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    val suite = Seq(
      graft.checks.NonNull(Seq("event_type"), name = "nn"),
      graft.checks.RangeMin("value", 0.0, name = "pos"),
      graft.checks.RowCountMin(1, name = "mn"))
    val verdicts = scala.collection.mutable.Map[Long, Map[String, graft.checks.CheckResult]]()
    EventsStream.runQuarantineIngestJob(spark, s"$dir/in", s"$dir/clean",
      s"$dir/dead", s"$dir/ckpt", suite,
      (id, rs) => { verdicts(id) = rs.map(r => r.check_name -> r).toMap; () })
    val clean = spark.read.parquet(s"$dir/clean")
    assert(clean.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(!clean.columns.contains("failed_checks"))
    val dead = spark.read.parquet(s"$dir/dead")
    val byId = dead.collect().map(r => r.getAs[Long]("event_id") ->
      r.getAs[String]("failed_checks")).toMap
    assert(byId == Map(2L -> "nn", 3L -> "pos"))
    // the in-flight verdict covers the WHOLE batch, not just the clean side
    val v = verdicts.values.head
    assert(!v("nn").passed && v("nn").violations == 1L)
    assert(!v("pos").passed && v("pos").violations == 1L)
    assert(v("mn").passed)
  }

  test("runHourlyJob: incremental file-source rollup matches the batch twin on closed windows") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_hourly").toString
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 10:55:00"), 7L, "click", 2.5, "{}"),
      (3L, ts("2024-01-01 14:00:00"), 8L, "view", 4.0, "{}")) // advances watermark past 10:00-11:00
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch1.write.parquet(s"$dir/in")
    EventsStream.runHourlyJob(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")

    // append-mode sink holds only FINALIZED windows (watermark = 14:00 - 2h
    // = 12:00 closes the 10:00 window; 14:00's own window is still open)
    val out1 = spark.read.parquet(s"$dir/out").collect()
    assert(out1.length == 1)
    assert(out1(0).getAs[Long]("n_events") == 2 && out1(0).getAs[Double]("total_value") == 4.0)

    // incremental: a NEW file lands, the next AvailableNow pass folds only
    // the unseen data and closes the next window
    Seq((4L, ts("2024-01-01 14:30:00"), 9L, "view", 1.0, "{}"),
        (5L, ts("2024-01-01 18:00:00"), 9L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")
    EventsStream.runHourlyJob(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val out2 = spark.read.parquet(s"$dir/out")
      .orderBy("hour_ts", "event_type").collect()
    assert(out2.length == 2) // + finalized 14:00 window (2 views, 5.0)
    assert(out2(1).getAs[Long]("n_events") == 2 && out2(1).getAs[Double]("total_value") == 5.0)
  }

  test("runUpsertJob maintains a latest-by-key parquet target; re-delivery overwrites (MERGE semantics)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_upsert").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 7L, "click", 2.0, "{}"), // newer same key
      (3L, ts("2024-01-01 10:30:00"), 8L, "view", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    EventsStream.runUpsertJob(spark, s"$dir/in", s"$dir/tgt", s"$dir/ckpt")
    val t1 = spark.read.parquet(s"$dir/tgt").orderBy("user_id").collect()
    assert(t1.length == 2)
    assert(t1(0).getAs[Double]("value") == 2.0) // (7, click): latest in batch wins

    // wave 2: only the NEW files feed the next batch (checkpoint), and a
    // re-delivered OLDER (7, click) row overwrites the newer target row —
    // the pinned true-MERGE divergence from last-writer-wins
    Seq((4L, ts("2024-01-01 09:00:00"), 7L, "click", 9.0, "{}"),
        (5L, ts("2024-01-01 12:00:00"), 9L, "signup", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")
    EventsStream.runUpsertJob(spark, s"$dir/in", s"$dir/tgt", s"$dir/ckpt")
    val t2 = spark.read.parquet(s"$dir/tgt").orderBy("user_id", "event_type").collect()
    assert(t2.length == 3)
    assert(t2(0).getAs[Double]("value") == 9.0)
    assert(t2(2).getAs[Double]("value") == 5.0)
  }

  test("runIvmAggJob folds micro-batches into the aggregate state; two waves == full recompute") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_ivm").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 7L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 10:30:00"), 8L, "view", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    EventsStream.runIvmAggJob(spark, s"$dir/in", s"$dir/state", s"$dir/ckpt")
    // wave 2: the checkpoint feeds only the new file into the fold
    Seq((4L, ts("2024-01-01 12:00:00"), 9L, "click", 4.0, "{}"),
        (5L, ts("2024-01-01 12:30:00"), 9L, "signup", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")
    EventsStream.runIvmAggJob(spark, s"$dir/in", s"$dir/state", s"$dir/ckpt")
    val state = spark.read.parquet(s"$dir/state").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSeq
    assert(state == Seq(("click", 3L, 7.5), ("signup", 1L, 5.0), ("view", 1L, 3.0)))
  }

  test("dedupWithinWatermark drops same-key events inside the horizon") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventsStream.dedupWithinWatermark(events).writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0), // dup key within watermark
        (3L, ts("2024-01-01 10:20:00"), 8L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_test").collect()
      assert(rows.length == 2) // the duplicate (7, click) was dropped
    } finally q.stop()
  }

  test("clickAttribution joins two real streams within the interval, state-bounded by watermarks") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    def df(ms: MemoryStream[(Long, Timestamp, Long, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventsStream.clickAttribution(df(clicks), df(purchases), withinSeconds = 1800)
      .writeStream.format("memory").queryName("attr_test").outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, 0.0),
        (2L, ts("2024-01-01 12:00:00"), 7L, 0.0), // no purchase within 30 min
        (3L, ts("2024-01-01 10:00:00"), 8L, 0.0))
      purchases.addData(
        (50L, ts("2024-01-01 10:20:00"), 7L, 9.5), // within 30 min of click 1
        (51L, ts("2024-01-01 09:50:00"), 7L, 1.0), // BEFORE the click: excluded
        (52L, ts("2024-01-01 11:00:00"), 8L, 3.0)) // 60 min after click 3: excluded
      q.processAllAvailable()
      val got = spark.table("attr_test")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 50L)))
    } finally q.stop()
  }

  test("trendingType chains two stateful aggregations in one streaming query") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = EventsStream.trendingType(events).writeStream
      .format("memory").queryName("trend_test").outputMode("append").start()
    try {
      // hour 10: 2 clicks vs 1 view; hour 11: tie (1 click, 1 view) —
      // the struct max breaks it toward the larger type string
      ms.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click"),
        (2L, ts("2024-01-01 10:15:00"), 2L, "click"),
        (3L, ts("2024-01-01 10:25:00"), 3L, "view"),
        (4L, ts("2024-01-01 11:05:00"), 1L, "click"),
        (5L, ts("2024-01-01 11:10:00"), 2L, "view"))
      q.processAllAvailable()
      // advance the watermark (2h delay) past both hours so both chained
      // states finalize and emit
      ms.addData((99L, ts("2024-01-01 16:00:00"), 9L, "noise"))
      q.processAllAvailable()
      ms.addData((100L, ts("2024-01-01 18:00:00"), 9L, "noise"))
      q.processAllAvailable()
      val got = spark.table("trend_test")
        .select("hour_ts", "top_type", "top_n")
        .as[(Timestamp, String, Long)].collect()
        .filter(_._1.getTime <= ts("2024-01-01 11:00:00").getTime).toSet
      assert(got == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)), s"got $got")
      // end-state == the batch twin on the same frame
      val batch = EventsStream.trendingType(spark.createDataFrame(Seq(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click"),
        (2L, ts("2024-01-01 10:15:00"), 2L, "click"),
        (3L, ts("2024-01-01 10:25:00"), 3L, "view"),
        (4L, ts("2024-01-01 11:05:00"), 1L, "click"),
        (5L, ts("2024-01-01 11:10:00"), 2L, "view"))).toDF("event_id", "ts", "user_id", "event_type"))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("clickAttributionLeftOuter emits unconverted clicks with NULL purchase at watermark eviction") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    def df(ms: MemoryStream[(Long, Timestamp, Long, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventsStream.clickAttributionLeftOuter(df(clicks), df(purchases), withinSeconds = 1800)
      .writeStream.format("memory").queryName("attr_outer_test").outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, 0.0),  // converts
        (2L, ts("2024-01-01 12:00:00"), 7L, 0.0),  // never converts
        (3L, ts("2024-01-01 10:00:00"), 8L, 0.0))  // purchase outside window
      purchases.addData(
        (50L, ts("2024-01-01 10:20:00"), 7L, 9.5),
        (52L, ts("2024-01-01 11:00:00"), 8L, 3.0))
      q.processAllAvailable()
      // push both watermarks far past every click's join window so the
      // outer (NULL) rows for clicks 2 and 3 are evicted and emitted
      clicks.addData((99L, ts("2024-01-03 00:00:00"), 99L, 0.0))
      purchases.addData((98L, ts("2024-01-03 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      clicks.addData((97L, ts("2024-01-04 00:00:00"), 99L, 0.0))
      purchases.addData((96L, ts("2024-01-04 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val got = spark.table("attr_outer_test")
        .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
      assert(got.contains((1L, Some(50L))), s"matched click missing: $got")
      assert(got.contains((2L, None)), s"unconverted click 2 missing: $got")
      assert(got.contains((3L, None)), s"out-of-window click 3 missing: $got")
      // streaming end-state == batch left join on the same frames
      val batch = EventsStream.clickAttributionLeftOuter(
        spark.table("attr_outer_test").sparkSession.createDataFrame(Seq(
          (1L, ts("2024-01-01 10:00:00"), 7L, 0.0),
          (2L, ts("2024-01-01 12:00:00"), 7L, 0.0),
          (3L, ts("2024-01-01 10:00:00"), 8L, 0.0))).toDF("event_id", "ts", "user_id", "value"),
        spark.createDataFrame(Seq(
          (50L, ts("2024-01-01 10:20:00"), 7L, 9.5),
          (52L, ts("2024-01-01 11:00:00"), 8L, 3.0))).toDF("event_id", "ts", "user_id", "value"),
        withinSeconds = 1800)
        .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
      assert((got.filter(_._1 <= 3L)) == batch, s"stream end-state $got != batch $batch")
    } finally q.stop()
  }

  test("sessionizeStream finalizes sessions via gap and event-time timeout, matching the batch twin") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id")
    val q = EventsStream.sessionizeStream(events, gapSeconds = 1800).writeStream
      .format("memory").queryName("sess_test").outputMode("append").start()
    try {
      // batch 1: user 7 opens a session; user 8 opens one
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 10:10:00"), 7L),
        (3L, ts("2024-01-01 10:00:00"), 8L))
      q.processAllAvailable()
      // batch 2: user 7's third event continues the session, the fourth
      // (50 min later) closes it and opens session 2
      ms.addData(
        (4L, ts("2024-01-01 10:20:00"), 7L),
        (5L, ts("2024-01-01 11:10:00"), 7L))
      q.processAllAvailable()
      // flush: advance the watermark far past everything so event-time
      // timeouts finalize the open sessions (watermark delay is 2 h)
      ms.addData((99L, ts("2024-01-02 09:00:00"), 99L))
      q.processAllAvailable()
      ms.addData((100L, ts("2024-01-03 09:00:00"), 99L))
      q.processAllAvailable()

      val got = spark.table("sess_test")
        .select("user_id", "session_seq", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      def us(s: String) = ts(s).getTime * 1000L
      assert(got.contains((7L, 1L, 3L, us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00"))))
      assert(got.contains((7L, 2L, 1L, us("2024-01-01 11:10:00"), us("2024-01-01 11:10:00"))))
      assert(got.contains((8L, 1L, 1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"))))

      // the batch twin agrees on sessions closed by the stream (users 7, 8)
      val batch = graft.operators.Temporal.sessionize(
        Seq((1L, ts("2024-01-01 10:00:00"), 7L), (2L, ts("2024-01-01 10:10:00"), 7L),
          (3L, ts("2024-01-01 10:00:00"), 8L), (4L, ts("2024-01-01 10:20:00"), 7L),
          (5L, ts("2024-01-01 11:10:00"), 7L)).toDF("event_id", "ts", "user_id"),
          "user_id", "ts", "event_id", 1800)
        .groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n"), min(unix_micros($"ts")).as("s"), max(unix_micros($"ts")).as("e"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(batch == got.filter(_._1 != 99L))

      // a session AFTER a timeout-finalized one must number seq+1, not
      // restart at 1 (the counter survives finalization)
      ms.addData((6L, ts("2024-01-03 10:00:00"), 7L))
      q.processAllAvailable()
      ms.addData((101L, ts("2024-01-05 09:00:00"), 99L))
      q.processAllAvailable()
      val seqs = spark.table("sess_test").filter($"user_id" === 7L)
        .select("session_seq").as[Long].collect().toSet
      assert(seqs == Set(1L, 2L, 3L), s"got $seqs")
    } finally q.stop()
  }

  test("sessionWindowAgg: native session_window emits finalized sessions; exact-gap events merge") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("e")).withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
    val q = EventsStream.sessionWindowAgg(events, gapSeconds = 1800).writeStream
      .format("memory").queryName("sw_test").outputMode("append").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 10:20:00"), 7L), // within gap: merges
        (3L, ts("2024-01-01 10:50:00"), 7L), // exactly gap after #2: MERGES (<= gap)
        (4L, ts("2024-01-01 12:00:00"), 8L))
      // watermark push so the sessions finalize (append emits only closed windows)
      ms.addData((99L, ts("2024-01-03 00:00:00"), 99L))
      q.processAllAvailable()
      val rows = spark.table("sw_test").orderBy("user_id", "start_us")
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq
      def us(x: String) = ts(x).getTime * 1000L
      assert(rows == Seq(
        (7L, us("2024-01-01 10:00:00"), us("2024-01-01 10:50:00") + 1800000000L, 3L),
        (8L, us("2024-01-01 12:00:00"), us("2024-01-01 12:00:00") + 1800000000L, 1L)),
        s"got $rows")
    } finally q.stop()
  }

  test("scd2Stream (transformWithState): closes versions on change, matching the batch SCD2 rule") {
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val q = EventsStream.scd2Stream(events).writeStream
      .format("memory").queryName("scd2_test").outputMode("append").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
        (2L, ts("2024-01-01 10:10:00"), 7L, "view"),   // repeat: collapses
        (3L, ts("2024-01-01 10:20:00"), 7L, "click"),  // closes view
        (4L, ts("2024-01-01 09:00:00"), 8L, "view"))
      q.processAllAvailable()
      // a later batch closes click -> purchase; user 8 stays open (no output)
      ms.addData((5L, ts("2024-01-01 11:00:00"), 7L, "purchase"))
      q.processAllAvailable()
      def us(x: String) = ts(x).getTime * 1000L
      val rows = spark.table("scd2_test")
        .orderBy("user_id", "valid_from_us")
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(rows == Seq(
        (7L, "view", us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00")),
        (7L, "click", us("2024-01-01 10:20:00"), us("2024-01-01 11:00:00"))),
        s"got $rows")
      // cross-check vs the batch twin: the stream's output must equal the
      // batch SCD2 history's CLOSED rows over the same events
      val batch = spark.createDataset(Seq(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
        (2L, ts("2024-01-01 10:10:00"), 7L, "view"),
        (3L, ts("2024-01-01 10:20:00"), 7L, "click"),
        (4L, ts("2024-01-01 09:00:00"), 8L, "view"),
        (5L, ts("2024-01-01 11:00:00"), 7L, "purchase")))
        .toDF("event_id", "ts", "user_id", "event_type")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      val closed = batch
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .withColumn("__p", lag($"event_type", 1).over(byUser))
        .filter($"__p".isNull || $"__p" =!= $"event_type")
        .select($"user_id", $"event_type", $"ts_us".as("valid_from_us"),
          lead($"ts_us", 1).over(byUser).as("valid_to_us"))
        .filter($"valid_to_us".isNotNull)
        .as[(Long, String, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._3))
      assert(rows == closed, s"stream $rows != batch closed $closed")
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("abandonedFlows (event-time timers): unconverted starts emit at watermark, converted ones never") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val q = EventsStream.abandonedFlows(events, "view", "purchase", timeoutSeconds = 1800)
      .writeStream.format("memory").queryName("abandon_test").outputMode("append").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),      // never converts -> abandon
        (2L, ts("2024-01-01 10:05:00"), 8L, "view"),
        (3L, ts("2024-01-01 10:20:00"), 8L, "purchase"))  // converts in time
      q.processAllAvailable()
      assert(spark.table("abandon_test").isEmpty) // nothing provably late yet
      // watermark push: 13:00 - 2h delay = 11:00 watermark > both deadlines
      ms.addData((99L, ts("2024-01-01 13:00:00"), 99L, "view"))
      q.processAllAvailable()
      def us(x: String) = ts(x).getTime * 1000L
      val rows = spark.table("abandon_test")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(rows == Seq(
        (7L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00"))),
        s"got $rows")
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("abandonedFlows matches the batch twin: convert->restart, re-arm suppression, same-ts ties, late conversions") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val q = EventsStream.abandonedFlows(events, "view", "purchase", timeoutSeconds = 1800)
      .writeStream.format("memory").queryName("abandon_twin").outputMode("append").start()
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, Timestamp, Long, String)]
    def feed(rows: (Long, Timestamp, Long, String)*): Unit = {
      fed ++= rows; ms.addData(rows); q.processAllAvailable()
    }
    try {
      def us(x: String) = ts(x).getTime * 1000L
      // batch 1: arm flows across four users
      feed(
        // user 7: start -> convert -> start; the second flow must get its
        // OWN deadline (the stale 10:30 timer from the first start is
        // deleted on conversion — the r9 ADVICE high bug)
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
        (2L, ts("2024-01-01 10:10:00"), 7L, "purchase"),
        (3L, ts("2024-01-01 10:20:00"), 7L, "view"),
        // user 8: two views in one segment — only the first arms
        (4L, ts("2024-01-01 10:00:00"), 8L, "view"),
        (5L, ts("2024-01-01 10:05:00"), 8L, "view"),
        // user 9: armed; a LATE purchase arrives in batch 2
        (6L, ts("2024-01-01 10:00:00"), 9L, "view"),
        // user 10: armed; same-ts purchase+view tie in batch 1 — the
        // purchase must process first (batch twin's event_type tie-break),
        // converting the old flow and letting the view arm the next one
        (7L, ts("2024-01-01 10:00:00"), 10L, "view"),
        (8L, ts("2024-01-01 10:15:00"), 10L, "view"),
        (9L, ts("2024-01-01 10:15:00"), 10L, "purchase"))
      // batch 2: user 9's purchase lands AFTER its 10:30 deadline — the
      // conversion itself proves abandonment (emitted without any
      // watermark push), then view 11:05 arms the new segment and
      // converts in time
      feed(
        (10L, ts("2024-01-01 11:00:00"), 9L, "purchase"),
        (11L, ts("2024-01-01 11:05:00"), 9L, "view"),
        (12L, ts("2024-01-01 11:10:00"), 9L, "purchase"),
        (13L, ts("2024-01-01 13:30:00"), 99L, "view"))
      // (the no-data watermark batch may already have fired other users'
      // timers by now; user 9's row specifically must NOT wait for one —
      // its 10:30 deadline is proven by the 11:00 purchase itself)
      assert(spark.table("abandon_twin").as[(Long, Long, Long)].collect()
        .contains((9L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00"))),
        "late conversion must emit the abandonment immediately")
      // batch 3: watermark 11:30 (13:30 - 2h) fires the timers for users
      // 7 (10:50), 8 (10:30), 10 (10:45); user 8's post-expiry view at
      // 11:30 must NOT re-arm (segment already consumed)
      feed((14L, ts("2024-01-01 11:30:00"), 8L, "view"),
           (15L, ts("2024-01-01 14:30:00"), 99L, "view"))
      // batch 4: watermark 12:30 > 11:30+T — a wrongly re-armed user-8
      // flow would fire here; batch 5: watermark 16:00 flushes user 99
      feed((16L, ts("2024-01-01 18:00:00"), 99L, "view"))
      feed((17L, ts("2024-01-01 21:00:00"), 99L, "view"))
      val got = spark.table("abandon_twin").as[(Long, Long, Long)].collect().toSeq.sorted
      assert(got == Seq(
        (7L, us("2024-01-01 10:20:00"), us("2024-01-01 10:50:00")),
        (8L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00")),
        (9L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00")),
        (10L, us("2024-01-01 10:15:00"), us("2024-01-01 10:45:00")),
        (99L, us("2024-01-01 13:30:00"), us("2024-01-01 14:00:00"))), s"got $got")
      // the stream's complete output must equal the batch twin over the
      // SAME events (the stream_abandoned_flows rule, inlined)
      val T = 1800L * 1000000L
      val ev = fed.toSeq.toDF("event_id", "ts", "user_id", "event_type")
        .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
      val ordered = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us".asc, $"event_type".asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val flows = ev
        .withColumn("last_p",
          max(when($"event_type" === "purchase", $"ts_us")).over(ordered))
        .filter($"event_type" === "view")
        .groupBy($"user_id", coalesce($"last_p", lit(-1L)).as("seg"))
        .agg(min($"ts_us").as("start_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts_us".as("p_us"))
      val batchRows = flows.join(purchases,
          $"user_id" === $"p_user" && $"p_us" > $"start_us" && $"p_us" <= $"start_us" + T,
          "left_anti")
        .select($"user_id", $"start_us", ($"start_us" + T).as("deadline_us"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
        // streaming can only prove abandonment up to the final watermark
        .filter(_._3 <= us("2024-01-01 21:00:00") - 2L * 3600000000L)
      assert(got == batchRows, s"stream $got != batch twin $batchRows")
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("scd2Stream drops rows later than the open version's start instead of emitting inverted intervals") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val q = EventsStream.scd2Stream(events).writeStream
      .format("memory").queryName("scd2_late").outputMode("append").start()
    try {
      def us(x: String) = ts(x).getTime * 1000L
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
        (2L, ts("2024-01-01 10:20:00"), 7L, "click"))
      q.processAllAvailable()
      // late row BEFORE the open version's valid_from (10:20): dropped —
      // the already-emitted (view, 10:00, 10:20) interval can't be rewritten
      ms.addData((3L, ts("2024-01-01 10:10:00"), 7L, "purchase"))
      q.processAllAvailable()
      ms.addData((4L, ts("2024-01-01 11:00:00"), 7L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("scd2_late").orderBy("valid_from_us")
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(rows == Seq(
        (7L, "view", us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00")),
        (7L, "click", us("2024-01-01 10:20:00"), us("2024-01-01 11:00:00"))),
        s"late row must be dropped, open version preserved: $rows")
      rows.foreach { r => assert(r._4 > r._3, s"inverted interval $r") }
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }
}
