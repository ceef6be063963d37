package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert-by-primary-key semantics (K3) without a table format.
  *
  * The reference gets upserts from Flink's `PRIMARY KEY ... NOT ENFORCED` on
  * an Iceberg v2 table (`create.sql:132`, `sink_risk_score_daily.sql:12`) and
  * documents the batch job as safely re-runnable (README:136). On plain
  * parquet the same contract is a dedup-on-write: union incoming over
  * existing, keep exactly one row per key — the one with the highest
  * precedence.
  *
  * Scale notes: one shuffle on the key columns (window partition). When the
  * upsert targets a date-partitioned table, pair this with dynamic partition
  * overwrite (`Maintenance.overwritePartitions`) so only affected partitions
  * rewrite — the MERGE pattern for 100 TB tables without a transaction log.
  */
object Upsert {

  /** Keep one row per key: highest `precedence` wins; `tieBreak` resolves
    * exact ties deterministically. Incoming must carry the same schema.
    *
    * NULL-key rows follow SQL MERGE semantics: a NULL key never matches an
    * ON condition, so every null-key row — existing or incoming — passes
    * through un-deduplicated. Window partitioning alone would do the
    * OPPOSITE (it groups NULL keys into one partition and would silently
    * collapse all identity-less rows to a single survivor), and would also
    * disagree with [[upsertAntiJoin]], whose equi-join already never
    * matches NULLs — the same window-vs-join NULL asymmetry as
    * exact-dedup's two paths. The null-key rows still ride the window
    * shuffle as one partition; if a corpus carries null keys at volume,
    * split them off before the upsert (they need no dedup work at all).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             precedence: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(precedence.desc, tieBreak.desc)
    val hasKey = keys.map(col(_).isNotNull).reduce(_ && _)
    existing.unionByName(incoming)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !hasKey)
      .drop("__rn")
  }

  /** Anti-join formulation: replace keys present in `incoming`, keep the rest.
    * Same result when `incoming` has one row per key; broadcast-friendly when
    * the incoming batch is small relative to the table (the common daily-job
    * shape), avoiding a full-table shuffle.
    */
  def upsertAntiJoin(existing: DataFrame, incoming: DataFrame,
                     keys: Seq[String]): DataFrame =
    existing.join(broadcast(incoming.select(keys.map(col): _*).distinct()),
        keys, "left_anti")
      .unionByName(incoming)
}
