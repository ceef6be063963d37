package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational extension queries (joins/windows/top-k) on the star schema.
  * Populated incrementally; see SURVEY.md §7 step 8.
  */
object AnalyticsQueries {
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
