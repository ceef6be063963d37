package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention/churn survival analysis as an EXACT hazard table — the
  * Kaplan–Meier life-table core (event days, deaths, risk-set sizes,
  * per-day hazard) without the cumulative survival product: S(t) chains
  * t double multiplications whose grouping is engine-specific, while
  * the (deaths, n_at_risk, hazard) table carries the same information
  * with every column an exact integer or ONE gated division — so it
  * hash-verifies, and any consumer can fold S(t) locally over the
  * metadata-sized table in whatever precision it wants.
  *
  * "Death" is an entity's LAST activity day (its churn day); entities
  * still active at the corpus end are counted as deaths on their last
  * observed day — dataset-end censoring is NOT modeled, which biases
  * late-day hazards high (disclosed; feed a cutoff-filtered frame to
  * exclude the censored tail).
  *
  * Scale shape: one map-combined max per entity, one count per day, and
  * a reverse-cumulative window over DISTINCT DAYS ONLY — the only
  * empty-partition window rides a frame bounded by the calendar, not
  * the data (the two-pass-quantiles discipline).
  */
object Survival {

  /** One row per distinct last-activity day: `d`, `deaths`, `n_at_risk`
    * (entities whose last day is ≥ d), `hazard` = deaths / n_at_risk.
    */
  def hazardTable(df: DataFrame, entityCol: Column, dayCol: Column): DataFrame = {
    val last = df.groupBy(entityCol.as("__e")).agg(max(dayCol).as("d"))
    val perDay = last.groupBy(col("d")).agg(count(lit(1)).as("deaths"))
    val reverseCum = Window.orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    perDay
      .withColumn("n_at_risk", sum(col("deaths")).over(reverseCum))
      .withColumn("hazard",
        col("deaths").cast("double") / col("n_at_risk").cast("double"))
      .orderBy(col("d"))
  }
}
