package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front) per group: the points no other point
  * dominates on both maximized dimensions — "best tradeoffs" queries
  * (quality vs length, recency vs score) without picking a weighting.
  *
  * The sort-filter algorithm: order by (x desc, y desc) within the group;
  * a point is on the skyline iff its y strictly exceeds the running max of
  * y over all preceding points (anything earlier has ≥ x, so a
  * non-greater y means dominated; the y-desc tie order makes same-x
  * groups keep only their top y). Points are deduplicated first so the
  * strict test is exact set semantics. One window over the group key —
  * O(n log n) per group vs the naive O(n²) dominance join, which is
  * what the oracle runs (NOT EXISTS a dominator) to prove equivalence.
  */
object Skyline {

  /** Distinct (group, x, y) points not dominated within their group, both
    * dimensions maximized.
    */
  def skyline2d(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val pts = df.select(col(groupCol), col(xCol), col(yCol)).distinct()
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(xCol).desc, col(yCol).desc)
    val prevMaxY = max(col(yCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    pts.withColumn("__pm", prevMaxY)
      .filter(col("__pm").isNull || col(yCol) > col("__pm"))
      .drop("__pm")
  }
}
