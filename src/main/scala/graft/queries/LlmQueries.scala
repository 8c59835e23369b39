package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operator queries (extension phase, SURVEY.md §7.9):
  * dedup family, similarity search, text analysis, multimodal plumbing. */
object LlmQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
