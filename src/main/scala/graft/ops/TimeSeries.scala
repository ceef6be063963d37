package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap repair beyond forward fill: linear interpolation of a
  * sparsely-observed metric at every probe timestamp, per entity — the
  * sensor/metrics-pipeline resampling step (forward fill answers "most
  * recent known value"; interpolation answers "best estimate AT this
  * instant", which is what downstream feature windows usually want).
  *
  * Mechanism: knots (rows where the metric is present) and probes share one
  * per-entity timeline; the previous and next knot are
  * `last/first(_, ignoreNulls)` window lookups over that single (entity,
  * time) sort, and the interpolated value is one fixed-operand-order IEEE
  * expression over exact epoch-micros distances — so results are
  * bit-portable to a verification engine. Probes before the first / after
  * the last knot stay NULL (no extrapolation).
  *
  * Scale shape: one shuffle on the entity key, two frame-bounded window
  * passes over the SAME sort (no second exchange), pure projection after —
  * the [[graft.analytics.Drift.cusum]] envelope. A hot entity serializes
  * its own history through one task, the standard windowed caveat.
  */
object TimeSeries {

  /** Interpolate `valueCol` (NULL on probe rows) at every row of `df`,
    * per `entityCol`, ordered by (`tsMicrosCol`, `tieCol`). Emits
    * `interp` plus the bracketing knot distances for auditability.
    */
  def interpolate(df: DataFrame, entityCol: String, tsMicrosCol: String,
                  tieCol: String, valueCol: String): DataFrame = {
    val prev = Window.partitionBy(col(entityCol))
      .orderBy(col(tsMicrosCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val next = Window.partitionBy(col(entityCol))
      .orderBy(col(tsMicrosCol), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val knotT = when(v.isNotNull, col(tsMicrosCol))
    val out = df
      .withColumn("__pv", last(v, ignoreNulls = true).over(prev))
      .withColumn("__pt", last(knotT, ignoreNulls = true).over(prev))
      .withColumn("__nv", first(v, ignoreNulls = true).over(next))
      .withColumn("__nt", first(knotT, ignoreNulls = true).over(next))
    out.withColumn("interp",
        when(v.isNotNull, v.cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull &&
                col("__nt") > col("__pt"),
            col("__pv").cast("double") +
              (col("__nv") - col("__pv")).cast("double") *
              ((col(tsMicrosCol) - col("__pt")).cast("double") /
                (col("__nt") - col("__pt")).cast("double"))))
      .withColumn("prev_gap_us",
        when(col("__pt").isNotNull, col(tsMicrosCol) - col("__pt")))
      .withColumn("next_gap_us",
        when(col("__nt").isNotNull, col("__nt") - col(tsMicrosCol)))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
