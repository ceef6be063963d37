package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank statistics over groups. Spearman's ρ is computed from INTEGER ranks
  * (`row_number` with a deterministic id tie-break, so ranks are a
  * permutation and the classic formula ρ = 1 − 6·Σd²/(n(n²−1)) is exact):
  * Σd² and n are exact BIGINTs, and ρ itself is one fixed operand-order
  * IEEE expression over them — bit-stable across engines, the
  * `readability`/Flesch discipline.
  *
  * Scale shape: two rank windows partitioned by the group key (one shuffle
  * on the key; a window per metric) and one group aggregate. A single
  * monster group serializes through its partition's tasks — the standard
  * windowed-rank caveat; pre-split such groups upstream.
  */
object Correlation {

  /** Per-group simple least squares of `yCol` on `xCol` from EXACT integer
    * moment sums (n, Σx, Σy, Σxy, Σx² — all BIGINT under the hash):
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx), intercept from the means —
    * each one fixed-operand-order IEEE expression over exact longs, so the
    * fitted coefficients themselves cross engines bit-exactly. Degenerate
    * groups (all x equal) yield slope 0 by convention. One map-combined
    * aggregate; no second pass.
    */
  def regression(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"), sum(x * x).as("sum_x2"))
    val nD = col("n").cast("double")
    val det = nD * col("sum_x2").cast("double") -
      col("sum_x").cast("double") * col("sum_x").cast("double")
    val slope = when(det =!= 0.0,
      (nD * col("sum_xy").cast("double") -
        col("sum_x").cast("double") * col("sum_y").cast("double")) / det)
      .otherwise(0.0)
    agg.withColumn("slope", slope)
      .withColumn("intercept",
        (col("sum_y").cast("double") - col("slope") * col("sum_x").cast("double")) / nD)
  }

  /** Per-group Spearman rank correlation of `xCol` vs `yCol`:
    * (group, n, sum_d2, spearman_rho). Ties break by `idCol` in BOTH
    * rankings — deterministic, and tie-noise vanishes as groups grow.
    */
  def spearman(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               idCol: String): DataFrame = {
    val wx = Window.partitionBy(col(groupCol)).orderBy(col(xCol), col(idCol))
    val wy = Window.partitionBy(col(groupCol)).orderBy(col(yCol), col(idCol))
    df.select(col(groupCol), col(xCol), col(yCol), col(idCol))
      .withColumn("__rx", row_number().over(wx).cast("long"))
      .withColumn("__ry", row_number().over(wy).cast("long"))
      .withColumn("__d2", (col("__rx") - col("__ry")) * (col("__rx") - col("__ry")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("sum_d2"))
      .withColumn("spearman_rho",
        when(col("n") > 1,
          lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (col("n").cast("double") *
              (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
          .otherwise(lit(0.0)))
  }
}
