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
