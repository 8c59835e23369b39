package graft

import org.apache.spark.sql.functions._
import graft.models.Meta

/** FIXTURES.md §3 fixture: comma decimals, unmapped objective, campaign_id
  * with no campaigns match, late/early updated_time. */
class MetaSpec extends SparkSpec {
  import spark.implicits._

  private def ads = Seq(
    ("ad_1", "campaign_id_7", "CONVERSIONS", "10", "100", "5", "12,34", "1,10", "0,55", "99,00",
      "2024-01-01", "2024-01-01 10:00:00", "2024-01-02 10:00:00", "Acme", "77", "CRM"),
    ("ad_2", "campaign_id_9", "MYSTERY_GOAL", "20", "200", "8", "5,00", "2,00", "1,00", "0,00",
      "2024-01-02", "2024-01-02 10:00:00", "2024-01-05 10:00:00", "Acme", "77", "Whatever")
  ).toDF("ad_id", "campaign_id", "objective", "clicks", "impressions", "unique_clicks",
    "spend", "cpm", "cpc", "conversion_values", "date_start", "created_time",
    "updated_time", "account_name", "account_id", "optimization_goal")

  private def campaigns = Seq(
    ("cmp7", "Campaign Seven", "ACTIVE", "CONVERSIONS")
  ).toDF("id", "name", "status", "objective")

  test("fbAdsTransformed: casts, remaps, join, placeholders (fb_meta_ads_transformed.sql)") {
    val out = Meta.fbAdsTransformed(ads, campaigns)
    val rows = out.orderBy("ad_id").collect()
    val cols = out.columns
    assert(cols.length == 26) // 26-col wide shape, config.py:84-99
    val r1 = rows(0)
    assert(r1.getAs[Int]("clicks") == 10)
    assert(r1.getAs[Double]("spend") == 12.34)
    assert(r1.getAs[String]("media_type") == "Conversion Ad")
    assert(r1.getAs[String]("media_cluster") == "CRM")
    assert(r1.getAs[String]("campaign") == "Campaign Seven") // J1 matched
    assert(r1.getAs[Long]("id") == 1L)
    val r2 = rows(1)
    assert(r2.getAs[String]("media_type") == "Other Ad")     // unmapped objective
    assert(r2.getAs[String]("media_cluster") == "Other")     // guarded enum
    assert(r2.getAs[String]("campaign") == null)             // left-join miss
  }

  test("incrementalMerge: watermark append + last-writer-wins dedup (I1/A6)") {
    val existing = Seq(
      ("k1", "2024-01-01", 1.0, ts("2024-01-01 00:00:00")),
      ("k2", "2024-01-01", 2.0, ts("2024-01-02 00:00:00"))
    ).toDF("ad_id", "date", "spend", "updated_at")
    val source = Seq(
      ("k1", "2024-01-01", 1.0, ts("2024-01-01 00:00:00")),  // at/below watermark: skipped
      ("k2", "2024-01-01", 9.0, ts("2024-01-03 00:00:00")),  // newer version of k2
      ("k3", "2024-01-01", 3.0, ts("2024-01-04 00:00:00"))   // brand new
    ).toDF("ad_id", "date", "spend", "updated_at")
    val merged = Meta.incrementalMerge(existing, source, Seq("ad_id", "date"),
        tieBreak = Seq("ad_id"))
      .orderBy("ad_id").collect()
    assert(merged.length == 3)
    assert(merged.map(_.getDouble(2)).toSeq == Seq(1.0, 9.0, 3.0)) // k2 updated
  }

  test("mergeUpsert: true MERGE replays a backfill; incrementalMerge's LWW ignores it (pinned divergence)") {
    val key = Seq("ad_id", "date")
    val existing = Seq(
      ("k1", "2024-01-01", 1.0, ts("2024-01-05 00:00:00")), // newer than the backfill's k1
      ("k2", "2024-01-01", 2.0, ts("2024-01-01 00:00:00"))
    ).toDF("ad_id", "date", "spend", "updated_at")
    val backfill = Seq(
      ("k1", "2024-01-01", 9.0, ts("2024-01-03 00:00:00")), // re-delivered OLDER row
      ("k3", "2024-01-01", 3.0, ts("2024-01-02 00:00:00"))
    ).toDF("ad_id", "date", "spend", "updated_at")
    // MERGE: when matched UPDATE — the older batch row replaces k1
    val merged = Meta.mergeUpsert(existing, backfill, key, tieBreak = Seq("ad_id"))
      .orderBy("ad_id").collect()
    assert(merged.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("k1", 9.0), ("k2", 2.0), ("k3", 3.0)))
    // LWW: every backfill row sits at/below the high-watermark (01-05),
    // so incrementalMerge drops the whole batch — k3 never lands
    val lww = Meta.incrementalMerge(existing, backfill, key, tieBreak = Seq("ad_id"))
      .orderBy("ad_id").collect()
    assert(lww.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("k1", 1.0), ("k2", 2.0)))
    // steady state (every source row past the watermark): the two agree
    val steady = Seq(
      ("k2", "2024-01-01", 9.0, ts("2024-01-06 00:00:00")),
      ("k3", "2024-01-01", 3.0, ts("2024-01-07 00:00:00"))
    ).toDF("ad_id", "date", "spend", "updated_at")
    val a = Meta.mergeUpsert(existing, steady, key, tieBreak = Seq("ad_id"))
      .orderBy("ad_id").collect().toSeq
    val b = Meta.incrementalMerge(existing, steady, key, tieBreak = Seq("ad_id"))
      .orderBy("ad_id").collect().toSeq
    assert(a == b)
  }

  test("incrementalAggMerge folds batches to the full-recompute state (IVM)") {
    val raw = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L),
      ("a", 4L, 1L), ("c", 5L, 7L), ("b", 6L, 2L)
    ).toDF("k", "id", "v")
    val keys = Seq("k")
    val parts = Seq("n" -> count(lit(1)), "sv" -> sum(col("v")))
    val full = Meta.toPartials(raw, keys, parts)
    // fold three delta batches (id % 3) one at a time onto an empty state
    val folded = (0L until 3L).foldLeft(full.limit(0)) { (state, i) =>
      Meta.incrementalAggMerge(state,
        Meta.toPartials(raw.filter(col("id") % 3 === i), keys, parts),
        keys, Seq("n", "sv"))
    }
    assert(folded.orderBy("k").collect().toSeq == full.orderBy("k").collect().toSeq)
    // a group absent from a delta passes through the merge unchanged
    val plusEmpty = Meta.incrementalAggMerge(full, full.limit(0), keys, Seq("n", "sv"))
    assert(plusEmpty.orderBy("k").collect().toSeq == full.orderBy("k").collect().toSeq)
  }

  test("cleanedData coalesces nulls and parses comma money (cleaned_data.sql)") {
    val raw = Seq(
      (1L, "2024-01-01", null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], None: Option[Int], Some(10), "1,50", "0,10", "0,01", 5.0)
    ).toDF("id", "date", "channel", "campaign", "publisher", "clicks",
      "impressions", "media_cost_eur", "cpm", "cpc", "revenue")
    val r = Meta.cleanedData(raw).collect()(0)
    assert(r.getAs[String]("channel") == "N/A")
    assert(r.getAs[Int]("clicks") == 0)
    assert(r.getAs[Double]("media_cost_eur") == 1.5)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
