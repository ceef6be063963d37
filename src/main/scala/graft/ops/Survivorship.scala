package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record construction — the survivorship step that follows entity
  * resolution (cluster ids from
  * [[graft.dedup.DupClusters.connectedComponents]] / `q_er_entities`):
  * merge each cluster's conflicting source records into one record by
  * field-wise "latest non-null wins" under a caller-supplied revision
  * order, plus a per-field conflict census (distinct non-null values) so
  * data stewards can see WHERE the sources disagree. The standard MDM
  * merge rule; alternative rules (most-frequent, source-priority) are the
  * same aggregate with a different key.
  *
  * Scale shape: ONE map-combined `groupBy(cluster)` — each field's
  * survivor is `max_by(field, (field IS NOT NULL, revision...))`, a hash
  * aggregate with partial combine (no per-cluster sort, no window), so a
  * celebrity cluster reduces through combiners. The non-null-dominant key
  * makes "latest non-null" a pure max — engines whose arg_max ignores
  * nulls differently replay it via the equivalent IGNORE NULLS window
  * form.
  */
object Survivorship {

  /** One golden row per cluster: `golden_<f>` survivors and `nd_<f>`
    * distinct-non-null conflict counts for every field, plus the source
    * record count.
    */
  def goldenRecords(records: DataFrame, clusterCol: String,
                    revCols: Seq[String], fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "at least one field to merge")
    require(revCols.nonEmpty, "at least one revision-order column")
    val key: Column => Column = f =>
      struct(f.isNotNull.cast("int").as("__nn") +: revCols.map(col): _*)
    val aggs =
      fields.map(f => max_by(col(f), key(col(f))).as(s"golden_$f")) ++
        fields.map(f => countDistinct(col(f)).as(s"nd_$f")) :+
        count(lit(1)).as("n_sources")
    records.groupBy(col(clusterCol).as("cluster"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
