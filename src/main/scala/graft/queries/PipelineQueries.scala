package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operators (dedup / similarity / text / multimodal) on
  * the documents + embeddings tables. Populated incrementally.
  */
object PipelineQueries {
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
