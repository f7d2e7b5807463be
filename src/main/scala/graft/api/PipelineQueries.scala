package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operators (dedup, similarity search, text analysis,
  * multimodal) over the `documents` / `embeddings` tables — filled in as
  * the operators land (see SURVEY.md §7.2 step 8). */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
