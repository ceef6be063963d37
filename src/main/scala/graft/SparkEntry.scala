package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in `graft.queries.*` grouped by subsystem:
  *  - [[TelematicsQueries]]  — reference-parity pipeline (ingest/score/serve/
  *    upsert/retention), SURVEY.md §2.
  *  - [[AnalyticsQueries]]   — relational extensions (joins/aggs/windows/
  *    top-k/set ops) on the star schema.
  *  - [[PipelineQueries]]    — LLM-data-pipeline operators (dedup, similarity,
  *    text analysis, multimodal) on documents/embeddings.
  *  - [[CurationQueries]]    — curation operators (packing, decontamination,
  *    PII, budgets, fuzzy matching, format round-trips).
  *  - [[VersionedQueries]]   — snapshot versioning surface (time travel, CDC).
  */
object SparkEntry {

  /** Flagship: the daily risk-score pipeline end-to-end on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    TelematicsQueries.defs("q_risk_score_daily")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TelematicsQueries.defs ++ AnalyticsQueries.defs ++ PipelineQueries.defs ++
      CurationQueries.defs ++ VersionedQueries.defs ++ TpchQueries.defs ++
      SelectionQueries.defs ++ SummaryQueries.defs ++ StatQueries.defs

  def oracleSql: Map[String, String] =
    TelematicsQueries.oracles ++ AnalyticsQueries.oracles ++ PipelineQueries.oracles ++
      CurationQueries.oracles ++ VersionedQueries.oracles ++ TpchQueries.oracles ++
      SelectionQueries.oracles ++ SummaryQueries.oracles ++ StatQueries.oracles
}
