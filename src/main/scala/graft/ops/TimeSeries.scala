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

  /** Pooled lag-k autocorrelation of an integer-scaled metric: for each
    * lag in `lags`, Pearson r over every within-entity pair (x_t, x_{t+k})
    * with t ordered by (`tsCol`, `tieCol`) — the seasonality/persistence
    * audit behind cache-TTL and forecast-feature decisions. Pairs never
    * cross entities, so no cross-series artifacts.
    *
    * Plan shape: ONE per-entity sort carries every lag (all `lead(x, k)`
    * columns ride the same window spec), the per-lag pair stream is a
    * partition-local explode of a |lags|-element struct array, and the
    * statistics collapse in one map-combined aggregate to |lags| rows —
    * shuffle cost is the single entity-key exchange regardless of how
    * many lags are probed. Every moment is an exact BIGINT/DECIMAL(38)
    * sum; r is the standard five-moment expression in fixed operand
    * order (sqrt is correctly-rounded IEEE, so the double hash-matches
    * across engines — the corr_matrix precedent). Degenerate lags
    * (no pairs, zero variance) yield NULL, not NaN.
    */
  def autocorrelation(df: DataFrame, entityCol: String, tsCol: String,
                      tieCol: String, valueCents: Column,
                      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1: $lags")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val withLags = df
      .select(col(entityCol), col(tsCol), col(tieCol), valueCents.cast("long").as("__x"))
      .select(col("__x") +: lags.map(k =>
        lead(col("__x"), k).over(w).as(s"__xl_$k")): _*)
    val pairs = withLags
      .select(explode(array(lags.map(k =>
          struct(lit(k.toLong).as("lag"), col("__x").as("x"), col(s"__xl_$k").as("y"))): _*))
        .as("p"))
      .select(col("p.lag"), col("p.x"), col("p.y"))
      .filter(col("y").isNotNull)
    pairs.groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).cast("decimal(38,0)").as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).cast("decimal(38,0)").as("syy"),
        sum(dec(col("x")) * dec(col("y"))).cast("decimal(38,0)").as("sxy"))
      .withColumn("acf", {
        val num = (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy"))).cast("double")
        val dx = (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx"))).cast("double")
        val dy = (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy"))).cast("double")
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy)))
      })
      // DECIMAL never ships in the emitted schema (driver canonicalization
      // divergence) — exact moments travel as canonical plain-digit strings.
      .withColumn("sxx", col("sxx").cast("string"))
      .withColumn("syy", col("syy").cast("string"))
      .withColumn("sxy", col("sxy").cast("string"))
      .orderBy(col("lag"))
  }

  /** Maximum drawdown per entity — the worst peak-to-trough decline of an
    * integer-scaled metric along the (ts, tie) order: the
    * metric-degradation number ("how far below its best has this
    * device/account fallen") that a running max alone doesn't give.
    * ENTIRELY exact BIGINT: running peak is a growing-frame max, each
    * row's drawdown is peak − x, and the argmax position breaks ties to
    * the EARLIEST trough. One shuffle on the entity key, two window
    * passes over the same sort (growing frame + whole-partition max —
    * never a shrinking frame).
    */
  def maxDrawdown(df: DataFrame, entityCol: String, tsCol: String,
                  tieCol: String, valueCents: Column): DataFrame = {
    val ord = Window.partitionBy(col("entity")).orderBy(col(tsCol), col(tieCol))
    val grow = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("entity"))
    df.select(col(entityCol).as("entity"), col(tsCol), col(tieCol),
        valueCents.cast("long").as("x"))
      .withColumn("pos", row_number().over(ord).cast("long"))
      .withColumn("__peak", max(col("x")).over(grow))
      .withColumn("__dd", col("__peak") - col("x"))
      .withColumn("__mdd", max(col("__dd")).over(all))
      .filter(col("__dd") === col("__mdd"))
      .groupBy(col("entity"))
      .agg(min(col("pos")).as("dd_pos"), max(col("__mdd")).as("max_drawdown"),
        max(col("__peak")).as("peak_at_trough"))
  }
}
