package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators beyond content redaction
  * ([[graft.text.Curation]]'s PII pass):
  *
  *  - [[pseudonym]]: deterministic keyed pseudonymization — the same id
  *    maps to the same opaque token everywhere (joins and aggregates still
  *    work across tables), while nothing recovers the id without the
  *    secret. md5(secret ‖ id): collision-safe at any realistic id
  *    cardinality, and a pure codegen projection.
  *  - [[kAnonymityRisk]]: the k-anonymity audit — quasi-identifier
  *    combinations observed fewer than k times re-identify their members;
  *    the audit counts risky groups and rows. One aggregate on the
  *    quasi-identifier key, map-side combined.
  */
object Privacy {

  /** Keyed pseudonym for `id` (any type; canonicalized via cast to string). */
  def pseudonym(id: Column, secret: String): Column =
    md5(concat(lit(secret), lit("|"), id.cast("string")))

  /** Quasi-identifier groups smaller than `k`, with their sizes. */
  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
}
