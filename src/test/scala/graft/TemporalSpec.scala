package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the greatest right ts <= left ts, equal-ts matches, no-prior keeps null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 09:30:00")), // equal to a right ts -> matches it
      (3L, 11L, ts("2024-01-01 08:00:00"))  // no prior right for user 11
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00")),
      (101L, 10L, ts("2024-01-01 09:30:00")),
      (102L, 11L, ts("2024-01-01 09:45:00")) // after left's ts
    ).toDF("event_id", "user_id", "ts")
      .withColumn("click_event_id", col("event_id"))
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id", Seq("click_event_id"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("click_event_id") == 101L) // latest prior
    assert(out(1).getAs[Long]("click_event_id") == 101L) // ts-equal match
    assert(out(2).isNullAt(out(2).fieldIndex("click_event_id"))) // left outer
  }

  test("asofJoinForward picks the smallest right ts >= left ts, equal-ts matches, no-later keeps null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 09:15:00")), // earliest at-or-after is 100 (09:30)
      (2L, 10L, ts("2024-01-01 09:30:00")), // equal to a right ts -> matches it
      (3L, 11L, ts("2024-01-01 10:00:00"))  // no later right for user 11
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 10:30:00")),
      (102L, 11L, ts("2024-01-01 09:45:00")) // before left's ts
    ).toDF("event_id", "user_id", "ts")
      .withColumn("click_event_id", col("event_id"))
    val out = Temporal.asofJoinForward(left, right, "user_id", "ts", "event_id", Seq("click_event_id"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("click_event_id") == 100L) // earliest at-or-after
    assert(out(1).getAs[Long]("click_event_id") == 100L) // ts-equal match
    assert(out(2).isNullAt(out(2).fieldIndex("click_event_id"))) // left outer
  }

  test("sessionize numbers sessions per key with the inactivity gap") {
    val e = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")), // same session (10 min)
      (3L, 7L, ts("2024-01-01 11:00:00")), // 50 min gap -> new session
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other user -> own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = Temporal.sessionize(e, "user_id", "ts", "event_id", gapSeconds = 1800)
      .orderBy("event_id").collect().map(_.getAs[Long]("session_seq")).toSeq
    assert(out == Seq(1L, 1L, 2L, 1L))
  }

  test("scd2Lookup: interval containment, open intervals, and tx-time travel compose") {
    val day = java.sql.Date.valueOf(_: String)
    // SCD-2 dimension: key 1 changes tier at 2024-02-01; key 2 open-only
    val dim = Seq(
      (1L, day("2024-01-01"), Option(day("2024-02-01")), "bronze"),
      (1L, day("2024-02-01"), Option.empty[java.sql.Date], "silver"),
      (2L, day("2024-01-15"), Option.empty[java.sql.Date], "gold")
    ).toDF("k", "valid_from", "valid_to", "tier")
    val facts = Seq(
      (10L, 1L, day("2024-01-20")), // inside the bronze interval
      (11L, 1L, day("2024-02-01")), // boundary: valid_from inclusive, valid_to exclusive -> silver
      (12L, 1L, day("2024-03-01")), // open interval -> silver
      (13L, 2L, day("2024-01-01")), // before any interval -> null
      (14L, 3L, day("2024-01-01"))  // unknown key -> null
    ).toDF("fid", "k", "d")
    val got = Temporal.scd2Lookup(facts, dim, "k", "d", Seq("tier"))
      .orderBy("fid").collect().map(_.getAs[String]("tier")).toSeq
    assert(got == Seq("bronze", "silver", "silver", null, null))

    // the bi-temporal composition: the SAME lookup against two snapshot
    // versions of the dimension answers with what the table knew THEN
    val root = java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/dim"
    val t = new graft.sources.SnapshotTable(spark, root)
    t.commitOverwrite(dim)
    val corrected = dim.withColumn("tier",
      when(col("tier") === "silver", "platinum").otherwise(col("tier")))
    t.commitOverwrite(corrected)
    def at(v: Long) = Temporal.scd2Lookup(facts, t.read(v), "k", "d", Seq("tier"))
      .orderBy("fid").collect().map(_.getAs[String]("tier")).toSeq
    assert(at(1L) == Seq("bronze", "silver", "silver", null, null))
    assert(at(2L) == Seq("bronze", "platinum", "platinum", null, null))
  }

  test("scd2Build: duplicates collapse, re-change reopens, NULL flips are changes, tail is current") {
    val feed = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some("a"), 1L),
      (10L, ts("2024-01-02 00:00:00"), Some("a"), 2L), // dup: collapses
      (10L, ts("2024-01-03 00:00:00"), Some("b"), 3L), // change
      (10L, ts("2024-01-04 00:00:00"), Some("a"), 4L), // back to a: reopens
      (11L, ts("2024-01-01 00:00:00"), None, 5L),      // first row, NULL state
      (11L, ts("2024-01-02 00:00:00"), Some("x"), 6L)  // NULL -> x is a change
    ).toDF("user_id", "ts", "state", "event_id")
    val out = Temporal.scd2Build(feed, Seq("user_id"), "ts",
        tracked = Seq("state"), tieBreak = Seq("event_id"))
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from").collect()
    val rows = out.map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq
    assert(rows == Seq(
      (10L, Some("a"), ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (10L, Some("b"), ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (10L, Some("a"), ts("2024-01-04 00:00:00"), None, true),
      (11L, None, ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), false),
      (11L, Some("x"), ts("2024-01-02 00:00:00"), None, true)))
    // intervals compose with the lookup half: a fact at 01-03 12:00 for
    // user 10 resolves to state "b"
    val fact = Seq((99L, 10L, ts("2024-01-03 12:00:00"))).toDF("fid", "user_id", "fts")
    val dim = Temporal.scd2Build(feed, Seq("user_id"), "ts",
      tracked = Seq("state"), tieBreak = Seq("event_id"))
    val looked = Temporal.scd2Lookup(fact, dim, "user_id", "fts", Seq("state"))
    assert(looked.collect().head.getAs[String]("state") == "b")
    // plan shape: exactly ONE exchange feeds both window passes
    val shuffles = dim.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1, s"scd2Build must cost one shuffle, saw $shuffles")
  }
}
