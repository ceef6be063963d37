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
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             precedence: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(precedence.desc, tieBreak.desc)
    existing.unionByName(incoming)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
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
