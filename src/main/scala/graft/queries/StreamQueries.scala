package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming-shaped capability (SURVEY.md §2.9): batch-equivalent queries
  * of the Structured Streaming pipelines in graft.streaming. */
object StreamQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
