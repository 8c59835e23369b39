package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventsStream

/** Streaming-shaped capability (SURVEY.md §2.9): batch twins of the
  * Structured Streaming pipelines in graft.streaming, oracle-checked. */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling-window agg — same transform the streaming job runs.
    "stream_hourly_by_type" -> ((s, d) =>
      EventsStream.hourlyByType(Tables.events(s, d))),

    // z-score anomaly detection on the hourly per-type series: trailing
    // 24h mean/stddev from EXACT integer window sums (no Welford path —
    // sum and sum-of-squares of counts are longs, so the double math has
    // one cross-engine shape), z rounded at the boundary, |z| > 3 flags.
    // One shuffle (hash by type+hour) + one in-partition window sort.
    "stream_anomaly" -> ((s, d) => {
      val hourly = Tables.events(s, d).filter(col("event_type").isNotNull)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts").asc)
        .rowsBetween(-24, -1)
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      val win = hourly.select(col("event_type"), col("hour_ts"), col("cnt"),
        sum(col("cnt")).over(w).as("s"),
        sum(col("cnt") * col("cnt")).over(w).as("s2"),
        count(lit(1)).over(w).as("c"))
      val variance = (dbl(col("s2")) - dbl(col("s")) * dbl(col("s")) / dbl(col("c"))) /
        dbl(col("c") - 1)
      val z = when(col("c") >= 12 && variance > lit(0.0),
        (dbl(col("cnt")) - dbl(col("s")) / dbl(col("c"))) / sqrt(variance))
      win.select(col("event_type"), col("hour_ts"), col("cnt"),
        round(z, 6).as("z"),
        when(z.isNull, lit(null).cast("boolean"))
          .otherwise(abs(z) > lit(3.0)).as("is_anomaly"))
    }),

    // Batch twin of dropDuplicatesWithinWatermark: earliest-wins keyed
    // dedup with a deterministic tie-break (the streaming op keeps the
    // first arrival; batch pins arrival order = (ts, event_id)).
    "stream_dedup_by_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("ts").as("first_ts"), col("event_id").as("first_event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // z-score anomaly detection over the hourly series: trailing-24h
    // mean/variance from exact integer window sums (sum, sum-of-squares
    // are LONGs → the double arithmetic has an identical shape on both
    // engines), z rounded at the boundary. A count spiking more than 3σ
    // above its trailing day flags.
    "stream_anomaly" -> """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
         count(*) AS cnt
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
), win AS (
  SELECT event_type, hour_ts, cnt,
         sum(cnt) OVER w AS s,
         sum(cnt * cnt) OVER w AS s2,
         count(*) OVER w AS c
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts ASC
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_ts, cnt,
       round(z, 6) AS z,
       CASE WHEN z IS NULL THEN NULL ELSE abs(z) > CAST(3.0 AS DOUBLE) END AS is_anomaly
FROM (
  SELECT *, CASE WHEN c >= 12 AND
                  (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) / CAST(c - 1 AS DOUBLE) > CAST(0.0 AS DOUBLE)
             THEN (CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) /
                  sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) / CAST(c - 1 AS DOUBLE))
             ELSE NULL END AS z
  FROM win)""",

    "stream_hourly_by_type" -> """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2""",

    "stream_dedup_by_key" -> """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS first_ts, event_id AS first_event_id
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1"""
  )
}
