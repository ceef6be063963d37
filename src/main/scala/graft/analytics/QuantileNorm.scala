package graft.analytics

import graft.ops.StableIds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-group quantile normalization: map every group's value distribution
  * onto the POOLED distribution (the microarray/batch-effect-correction
  * move, and how mixed-source training corpora get comparable quality
  * scores). Each row's within-group rank r (of n_s) targets pooled order
  * statistic ⌈((2r−1)·N + n_s) / (2·n_s)⌉-ish — the midpoint quantile
  * (2r−1)/(2n_s) materialized with pure integer arithmetic, clamped to
  * [1, N] — and the normalized value IS that pooled data value: exact, no
  * interpolation, hash-comparable.
  *
  * Scale shape: within-group ranks are group-partitioned windows (one
  * shuffle); the pooled order index uses [[StableIds]]' range-partition +
  * zipWithIndex — NOT a single-task global window; the final lookup is an
  * equi-join on the pooled position. The group-size table is
  * metadata-sized, the total-count join a broadcast of one row.
  */
object QuantileNorm {

  /** (idCol, groupCol, value, normalized) — `normalized` is the pooled
    * data value at the row's midpoint-quantile position.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    val v = df.select(col(groupCol), col(idCol), col(valueCol).cast("long").as("__v"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"), col(idCol))
    val ranked = v.withColumn("__rk", row_number().over(w).cast("long"))
    val sizes = v.groupBy(col(groupCol)).agg(count(lit(1)).as("__ns"))
    val total = v.agg(count(lit(1)).as("__nn"))
    val pooled = StableIds.withStableIds(
        v.select(col("__v"), col(idCol)), Seq("__v", idCol))
      .select((col("stable_id") + 1L).as("__pos"), col("__v").as("__pv"))
    ranked.join(sizes, groupCol)
      .crossJoin(broadcast(total))
      // SQL `div` is exact long floor division — no double round-trip, so
      // the index stays bit-exact however large the pooled table gets (the
      // remaining bound is (2r−1)·N overflowing long at ~2^31.5 rows per
      // side, far past any single pooled normalization)
      .withColumn("__idx", least(greatest(
        expr("((2L * __rk - 1L) * __nn + __ns) div (2L * __ns)"),
        lit(1L)), col("__nn")))
      .join(pooled, col("__idx") === col("__pos"))
      .select(col(idCol), col(groupCol), col("__v").as("value"),
        col("__pv").as("normalized"))
  }
}
