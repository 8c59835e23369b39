package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-shaped capability (SURVEY.md §2.9): the reference's
  * incremental materialization re-expressed as Structured Streaming, plus
  * the windowed aggregations a streaming events feed needs.
  * `hourlyByType` works on batch and streaming frames alike;
  * `dedupWithinWatermark` is streaming-only (Spark rejects it on batch
  * datasets) — its batch twin is the earliest-wins keyed dedup in
  * StreamQueries, which is what the oracle checks. The streaming paths
  * are exercised end-to-end in EventsStreamSpec.
  */
object EventsStream {

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour
    * watermark for late data (I1's streaming flavor). On a stream this
    * emits append-mode finalized windows; on a batch frame it is a plain
    * group-by. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // exact decimal aggregation (order-independent), DOUBLE at the
        // output boundary (engine-stable decimal→double cast)
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming dedup on a business key within the watermark horizon —
    * the streaming analog of the incremental unique_key merge (I1).
    * Batch equivalent: earliest-event-wins keyed dedup (StreamQueries
    * pins the deterministic tie-break). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** File-based streaming reader for an events-shaped directory — the
    * productionized entry: readStream → transform → writeStream with
    * checkpointing is the deployment shape at scale. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .parquet(dir)

  /** End-to-end streaming dedup job: file source → watermark dedup →
    * parquet sink, one Trigger.AvailableNow pass, exactly-once via the
    * checkpoint (a restart with the same checkpoint reprocesses nothing).
    * Blocks until the micro-batches drain; returns the streaming query's
    * run id. */
  def runDedupJob(spark: SparkSession, inDir: String, outDir: String,
                  checkpointDir: String): String =
    runJob(dedupWithinWatermark(readEventsStream(spark, inDir)), outDir, checkpointDir)

  /** End-to-end incremental materialization of the hourly rollup: file
    * source → watermark → tumbling-window agg → parquet sink (append mode
    * emits only FINALIZED windows — the streaming twin of the
    * `stream_hourly_by_type` batch query, and the deployment shape of the
    * reference's scheduled incremental models: new files land, the next
    * AvailableNow pass folds exactly the unseen data in). */
  def runHourlyJob(spark: SparkSession, inDir: String, outDir: String,
                   checkpointDir: String): String =
    runJob(hourlyByType(readEventsStream(spark, inDir)), outDir, checkpointDir)

  private def runJob(df: DataFrame, outDir: String, checkpointDir: String): String = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }
}
