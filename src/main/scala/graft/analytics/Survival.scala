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

  /** Nelson–Aalen cumulative hazard over the same life table: H(d) =
    * Σ_{d'≤d} deaths/n_at_risk with its variance estimate
    * Σ deaths/n_at_risk² — the estimator survival dashboards chain into
    * S̃(t) = e^−H when the KM product is too jumpy. Both cumulatives are
    * double folds, but they ride the ORDERED day frame (calendar-bounded
    * metadata, the [[hazardTable]] invariant), where both engines stream
    * the identical left fold. Per day: `d`, `deaths`, `n_at_risk`,
    * `cum_hazard`, `var_hazard`.
    */
  def nelsonAalen(df: DataFrame, entityCol: Column, dayCol: Column): DataFrame = {
    val forwardCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hazardTable(df, entityCol, dayCol)
      .withColumn("cum_hazard",
        sum(col("deaths").cast("double") / col("n_at_risk").cast("double"))
          .over(forwardCum))
      .withColumn("var_hazard",
        sum(col("deaths").cast("double") /
          (col("n_at_risk").cast("double") * col("n_at_risk").cast("double")))
          .over(forwardCum))
      .select(col("d"), col("deaths"), col("n_at_risk"),
        col("cum_hazard"), col("var_hazard"))
      .orderBy(col("d"))
  }

  /** Two-cohort log-rank test — "do these churn curves differ?", the
    * gate an experiment dashboard runs before reading the KM plots. Per
    * event day the hypergeometric expectation and variance of cohort-A
    * deaths accumulate over the calendar-bounded day frame: E₁ = Σ d·n₁/n,
    * V = Σ d·n₁·n₂·(n−d) / (n²·(n−1)), z = (O₁−E₁)/√V. O₁ is an exact
    * BIGINT; the E/V double folds ride ONE ordered window over the
    * metadata day frame (last row by max_by, never max) and z is one
    * fixed-operand-order expression. One row: `o1`, `e1`, `v`, `z`.
    */
  def logRank(df: DataFrame, entityCol: Column, dayCol: Column,
              cohortA: Column): DataFrame = {
    val last = df.groupBy(entityCol.as("__e"))
      .agg(max(dayCol).as("d"), max(cohortA).as("__a"))
    val perDay = last.groupBy(col("d"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("d2"))
    val reverseCum = Window.orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val forwardCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = perDay
      .withColumn("n1", sum(col("d1")).over(reverseCum))
      .withColumn("n2", sum(col("d2")).over(reverseCum))
    val dd = (col("d1") + col("d2")).cast("double")
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = (col("n1") + col("n2")).cast("double")
    val eTerm = dd * n1d / nd
    val vTerm = when(col("n1") + col("n2") > 1,
      dd * n1d * n2d * (nd - dd) / (nd * nd * (nd - lit(1.0))))
      .otherwise(lit(0.0))
    val folded = risk
      .withColumn("__ce", sum(eTerm).over(forwardCum))
      .withColumn("__cv", sum(vTerm).over(forwardCum))
      .agg(sum(col("d1")).as("o1"),
        max_by(col("__ce"), col("d")).as("e1"),
        max_by(col("__cv"), col("d")).as("v"))
    folded.select(col("o1"), col("e1"), col("v"),
      when(col("v") > lit(0.0),
        (col("o1").cast("double") - col("e1")) / sqrt(col("v"))).as("z"))
  }
}
