package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * `sample(fraction)` is neither exact-count nor stable across reruns and
  * partitionings; dataset curation wants "exactly n documents per stratum,
  * reproducibly". Hash-ordering (`md5(id)`) gives a fixed pseudo-random
  * permutation per stratum — same inputs, same sample, on any cluster.
  *
  * Scale shape: one shuffle on the stratum; the `row_number ≤ n` filter
  * triggers Spark's `WindowGroupLimit` rewrite (asserted in SamplingSpec),
  * so each map task forwards only its local top-n per stratum — a hot
  * stratum never materializes, let alone sorts, all of its rows in one
  * partition.
  */
object Sampling {

  /** Exactly `min(n, |stratum|)` rows per stratum, hash-selected. `id` must
    * be unique (it both seeds the permutation and breaks ties).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, n: Int, id: Column): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
