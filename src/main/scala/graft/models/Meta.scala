package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._

/** The taico/meta dbt models (reference: include/dbt/models/taico/meta/):
  * the flagship pipeline's transform + incremental-staging semantics
  * (SURVEY.md §2.8, §2.9, §3.1).
  */
object Meta {

  /** fb_meta_ads_transformed.sql:1-72 — the flagship transform:
    * comma-decimal numeric casts (F1/F2), objective→media_type CASE remap
    * (F6), optimization_goal IN-guard, literal channel, surrogate row id
    * (W1), net/net-net spend derivations (F13), left join to campaign
    * names on a synthesized key (J1).
    *
    * W1 note: the reference's `row_number() over ()` has no defined order;
    * we pin `order by ad_id` for determinism (SURVEY.md §7 risks). At
    * cluster scale an unpartitioned window is a single-task sort — callers
    * that only need uniqueness should prefer monotonically_increasing_id;
    * kept here because the reference's id IS a dense 1..N numbering.
    *
    * campaigns join (J1): right side is a dimension (thousands of rows at
    * most) — broadcast, so the fact side never shuffles. */
  def fbAdsTransformed(adsInsights: DataFrame, campaigns: DataFrame): DataFrame =
    fbAdsTransformed(adsInsights, campaigns, denseId = true)

  /** denseId=false swaps the reference-faithful dense 1..N numbering (an
    * unpartitioned window = single-task sort) for
    * monotonically_increasing_id — unique but sparse ids, fully parallel.
    * Use it when only uniqueness matters at cluster scale. */
  def fbAdsTransformed(adsInsights: DataFrame, campaigns: DataFrame,
                       denseId: Boolean): DataFrame = {
    val campDim = broadcast(
      campaigns.select(
        concat(lit("campaign_id_"), substring(col("id"), 4, Int.MaxValue)).as("campaign_id"), // :28
        col("name").as("campaign")))
    adsInsights
      .select(
        col("ad_id"), col("campaign_id"),
        // TIMESTAMP, not DATE: the reference casts to date (F8 :6), but
        // DATE cells normalize asymmetrically in pandas-based comparers
        // (datetime.date vs datetime64); midnight timestamps carry the
        // same information and hash-match — callers can cast back
        to_timestamp(col("date_start")).as("date"),                    // F8 :6
        col("clicks").cast(IntegerType).as("clicks"),                  // F2 :8-10
        col("impressions").cast(IntegerType).as("impressions"),
        col("unique_clicks").cast(IntegerType).as("unique"),
        commaDecimal(col("spend")).as("spend"),                        // F1 :11-14
        commaDecimal(col("cpm")).as("cpm"),
        commaDecimal(col("cpc")).as("cpc"),
        commaDecimal(col("conversion_values")).as("revenue"),
        col("account_name").as("publisher"),                           // P1 :15-21
        col("account_id").cast(StringType).as("property"),
        col("account_name").as("owner"),
        when(col("objective") === "CONVERSIONS", "Conversion Ad")      // F6 :42-47
          .when(col("objective") === "TRAFFIC", "Traffic Ad")
          .when(col("objective") === "VIDEO_VIEWS", "Video Ad")
          .otherwise("Other Ad").as("media_type"),
        guardedEnum(col("optimization_goal"),                          // F6 :48-51
          Seq("Classical", "CRM", "Digital"), "Other").as("media_cluster"),
        lit("facebook").as("channel"),                                 // F14 :38
        lit("group_placeholder").as("product_group"),                  // F14 :63-65
        lit("product_placeholder").as("product"),
        lit("audience_placeholder").as("audience"),
        col("created_time").cast(TimestampType).as("added_at"),        // F2 :61-62
        col("updated_time").cast(TimestampType).as("updated_at"))
      .withColumn("id",                                                // W1 :36
        if (denseId) row_number().over(Window.orderBy(col("ad_id"))).cast(LongType)
        else monotonically_increasing_id())
      // F13 :66-68 — net derivations stay DOUBLE: both engines then compute
      // the identical IEEE product (a DECIMAL cast would expose the engines'
      // different rounding modes on exact midpoints).
      .withColumn("gross_media_cost", col("spend"))
      .withColumn("net_media_cost", col("spend").cast(DoubleType) * 0.9)
      .withColumn("net_net_media_cost", col("spend").cast(DoubleType) * 0.8)
      .join(campDim, Seq("campaign_id"), "left")                       // J1 :26-31,71
  }

  /** main_taico_staging.sql:3-6,40-78 — dbt incremental materialization:
    * keep `existing`, append source rows with `updated_at` past the
    * high-watermark (A6), then last-writer-wins dedup on the unique key
    * (I1). The watermark is a scalar broadcast (one-row agg), the dedup a
    * keyed window — no full-table re-shuffle of `existing` is needed when
    * the output is partitioned by key at rest. */
  def incrementalMerge(existing: DataFrame, source: DataFrame,
                       uniqueKey: Seq[String], watermarkCol: String = "updated_at",
                       tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val wmRow = existing.agg(max(col(watermarkCol)).as("wm")).collect()(0)
    val newRows =
      if (wmRow.isNullAt(0)) source
      else source.filter(col(watermarkCol) > lit(wmRow.get(0)))
    val keyCols = uniqueKey.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(watermarkCol).desc +: tieBreak.map(col(_).asc): _*)
    existing.unionByName(newRows)                                       // U1 :73-78
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Raw rows → the mergeable partial-aggregate form of an incremental
    * aggregate table: one row per key with each aggregate's PARTIAL
    * (sums and counts — anything that merges by addition). This is what
    * gets persisted as the state table. */
  def toPartials(raw: DataFrame, keys: Seq[String],
                 partials: Seq[(String, Column)]): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)

  /** Incremental AGGREGATE maintenance (IVM): fold an already-partial
    * delta batch into the persisted aggregate state WITHOUT rescanning
    * history — the only affordable way to keep a grouped rollup current
    * over an append-only 100 TB fact. Every partial column merges by
    * SUM (counts are sums of 1s; averages/ratios derive from their
    * sum+count partials at read time), so the merge is
    * `state ∪ delta-partials → groupBy(keys) → sum(each)`: the shuffle
    * moves only group-cardinality rows from each side, never raw
    * history. Exactly equal to a full recompute when the partial
    * aggregates are order-independent (exact DECIMAL sums, counts) —
    * the `meta_ivm_agg` oracle pins that equivalence. */
  def incrementalAggMerge(state: DataFrame, deltaPartials: DataFrame,
                          keys: Seq[String], partialCols: Seq[String]): DataFrame =
    state.unionByName(deltaPartials).groupBy(keys.map(col): _*)
      .agg(sum(col(partialCols.head)).as(partialCols.head),
        partialCols.tail.map(p => sum(col(p)).as(p)): _*)

  /** Incremental JOIN maintenance — the join sibling of
    * [[incrementalAggMerge]], completing the IVM family (aggregate +
    * join). The maintained view is `V = A ⋈ B` (inner equi-join on
    * `joinKeys`); an upsert delta `ΔA` (keyed by `deltaKeys`, new +
    * replaced A-rows) folds in as delete-then-insert:
    *
    *   V' = (V ▷ ΔA.keys) ∪ (ΔA ⋈ B)
    *
    * Cost shape at 100 TB: the anti join streams V once against the
    * BROADCAST delta key set, and `ΔA ⋈ B` joins the broadcast delta
    * against B — so maintenance scans V and B but shuffles NOTHING and
    * never rejoins the full A (with V and B bucketed on the join key
    * even the scans prune to the delta's buckets). A full recompute
    * would shuffle both A and B; the `sync_ivm_join` oracle pins the
    * delete+insert result exactly equal to that recompute. Delta rows
    * deleting a key outright (tombstones) are the `deleteKeys` variant a
    * CDC feed needs — pass them in ΔA with no matching B row semantics
    * handled upstream. */
  def incrementalJoinMerge(view: DataFrame, deltaA: DataFrame, b: DataFrame,
                           deltaKeys: Seq[String], joinKeys: Seq[String]): DataFrame = {
    val delKeys = broadcast(deltaA.select(deltaKeys.map(col): _*).distinct())
    view.join(delKeys, deltaKeys, "left_anti")
      .unionByName(broadcast(deltaA).join(b, joinKeys))
  }

  /** Last-writer-wins snapshot: one row per `uniqueKey`, the greatest
    * `watermarkCol` winning, ties broken by `tieBreak` ascending. */
  def latestByKey(df: DataFrame, uniqueKey: Seq[String], watermarkCol: String,
                  tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(uniqueKey.map(col): _*)
      .orderBy(col(watermarkCol).desc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** TRUE MERGE / upsert semantics (dbt's `merge` strategy on
    * main_taico_staging.sql:3-6): the deduplicated SOURCE row replaces
    * the existing row for every matched unique key REGARDLESS of which
    * side carries the newer watermark — when matched UPDATE, when not
    * matched INSERT. This pins the documented divergence from
    * [[incrementalMerge]]'s last-writer-wins union: the two agree
    * whenever every source row is strictly newer than the target's
    * watermark (the steady-state incremental run), and differ under
    * reprocessing/backfill overlap, where MERGE lets a re-delivered
    * OLDER row overwrite a newer target row. Source-side duplicate keys
    * are resolved last-writer-wins first (a real MERGE raises on
    * multiple matches; dbt pre-dedupes the same way). Shape: one keyed
    * window over the source + one anti join — no shuffle of the target
    * beyond the join, and the anti join broadcasts whenever the batch
    * is small, the common incremental case. */
  def mergeUpsert(existing: DataFrame, source: DataFrame, uniqueKey: Seq[String],
                  watermarkCol: String = "updated_at",
                  tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val s = latestByKey(source, uniqueKey, watermarkCol, tieBreak)
    existing.join(s, uniqueKey, "left_anti").unionByName(s)
  }

  /** cleaned_data.sql:2-25 — null-coalescing defaults (F7) + comma-decimal
    * money casts over the 26-col wide table. */
  def cleanedData(raw: DataFrame): DataFrame =
    raw.select(
      col("id"), col("date").cast(TimestampType).as("date"),
      coalesce(col("channel"), lit("N/A")).as("channel"),
      coalesce(col("campaign"), lit("N/A")).as("campaign"),
      coalesce(col("publisher"), lit("N/A")).as("publisher"),
      coalesce(col("clicks"), lit(0)).as("clicks"),
      coalesce(col("impressions"), lit(0)).as("impressions"),
      commaDecimal(col("media_cost_eur")).as("media_cost_eur"),
      commaDecimal(col("cpm")).as("cpm"),
      commaDecimal(col("cpc")).as("cpc"),
      coalesce(col("revenue"), lit(0.0)).as("revenue"))
}
