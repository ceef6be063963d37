package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows *per group* (the grouped counterpart of O2's global top-k).
  *
  * `groupBy + sort + limit` per group is not expressible relationally
  * without a window; `row_number ≤ k` over `(group, order)` is, and Spark's
  * `WindowGroupLimit` optimizer rewrite turns it into a map-side partial
  * top-k before the shuffle — per-group heaps of size k on each input
  * partition, so a group's full row set is never collected anywhere
  * (asserted in GroupedTopKSpec). `orderCols` must be a total order within
  * each group for the result to be deterministic.
  */
object GroupedTopK {

  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
