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

  /** Empirical Markov entropy rate of the per-entity event-type chain:
    * H = −Σ_ij (n_ij/N)·ln(n_ij/n_i) over the class²-bounded transition
    * frame — "how predictable is the next event", the sessionization
    * companion of the raw transition counts. Counts exact; the double
    * fold rides one unpartitioned ordered cumulative over the bounded
    * cell frame (terms ≥ 0); `h_norm` divides by ln(k) computed per
    * engine.
    */
  def entropyRate(df: DataFrame, entityCol: String, orderCols: Seq[String],
                  stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val trans = df
      .select(Seq(col(entityCol)) ++ orderCols.map(col) :+
        col(stateCol).as("s"): _*)
      .withColumn("nxt", lead(col("s"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("s"), col("nxt")).agg(count(lit(1)).as("n_ij"))
    val rowT = trans.groupBy(col("s")).agg(sum(col("n_ij")).as("n_i"))
    val tot = trans.agg(sum(col("n_ij")).as("n"),
      countDistinct(col("s")).as("k_states"))
    val term = (lit(0.0) - col("n_ij").cast("double") / col("n").cast("double")) *
      log(col("n_ij").cast("double") / col("n_i").cast("double"))
    val wc = Window.orderBy(col("s"), col("nxt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trans.join(broadcast(rowT), Seq("s")).crossJoin(broadcast(tot))
      .withColumn("__c", sum(term).over(wc))
      .agg(max(col("n")).as("n_transitions"), max(col("k_states")).as("k_states"),
        max(col("__c")).as("h_rate_nats"))
      .withColumn("h_norm",
        when(col("k_states") > 1,
          col("h_rate_nats") / log(col("k_states").cast("double"))))
  }

  /** Pooled burstiness of inter-event gaps: exact micros gaps from one
    * lag window, exact moments, then the classic shape numbers — CV,
    * Goh–Barabási burstiness B = (σ−μ)/(σ+μ) (−1 regular … 0 Poisson …
    * →1 bursty) and the Fano factor σ²/μ — each one fixed-operand-order
    * expression over the exact sums (√ correctly rounded).
    */
  def burstiness(df: DataFrame, entityCol: String, orderCols: Seq[String],
                 tsMicros: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val gaps = df
      .select(Seq(col(entityCol)) ++ orderCols.map(col) :+
        tsMicros.cast("long").as("__t"): _*)
      .withColumn("g", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("g").isNotNull)
    val agg = gaps.agg(count(lit(1)).as("n_gaps"),
      sum(dec(col("g"))).as("sg"), sum(dec(col("g")) * dec(col("g"))).as("sgg"))
    val nd = col("n_gaps").cast("double")
    val mu = col("sg").cast("double") / nd
    val varNum = (dec(col("n_gaps")) * col("sgg") - col("sg") * col("sg"))
      .cast("double")
    val sd = sqrt(varNum / (nd * (nd - lit(1.0))))
    agg
      .withColumn("mean_gap_us", when(col("n_gaps") > 0, mu))
      .withColumn("sd_gap_us",
        when(col("n_gaps") > 1 && varNum >= lit(0.0), sd))
      .withColumn("cv",
        when(col("sd_gap_us").isNotNull && mu > lit(0.0),
          col("sd_gap_us") / col("mean_gap_us")))
      .withColumn("burstiness",
        when(col("sd_gap_us").isNotNull &&
             col("sd_gap_us") + col("mean_gap_us") > lit(0.0),
          (col("sd_gap_us") - col("mean_gap_us")) /
            (col("sd_gap_us") + col("mean_gap_us"))))
      .withColumn("fano",
        when(col("sd_gap_us").isNotNull && mu > lit(0.0),
          col("sd_gap_us") * col("sd_gap_us") / col("mean_gap_us")))
      .select(col("n_gaps"), col("sg").cast("string").as("sum_gap_us"),
        col("sgg").cast("string").as("sumsq_gap_us"), col("mean_gap_us"),
        col("sd_gap_us"), col("cv"), col("burstiness"), col("fano"))
  }

  /** Permutation entropy (order 3) pooled across entities: each
    * consecutive value triple maps to its ordinal pattern (ties break to
    * "earlier position is smaller" — `<=` on the forward comparisons, so
    * the code is a pure integer function of the data), counts are exact,
    * and the entropy folds over the ≤8-row pattern frame. 0 = monotone
    * deterministic series, ln 6 = white noise; `h_norm` divides by ln 6.
    */
  def permutationEntropy(df: DataFrame, entityCol: String,
                         orderCols: Seq[String], valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val pats = df
      .select(Seq(col(entityCol)) ++ orderCols.map(col) :+
        valueCol.cast("long").as("x1"): _*)
      .withColumn("x2", lead(col("x1"), 1).over(w))
      .withColumn("x3", lead(col("x1"), 2).over(w))
      .filter(col("x3").isNotNull)
      .select((when(col("x1") <= col("x2"), 4L).otherwise(0L) +
        when(col("x1") <= col("x3"), 2L).otherwise(0L) +
        when(col("x2") <= col("x3"), 1L).otherwise(0L)).as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("n_pat"))
    val tot = pats.agg(sum(col("n_pat")).as("n"))
    val term = (lit(0.0) - col("n_pat").cast("double") / col("n").cast("double")) *
      log(col("n_pat").cast("double") / col("n").cast("double"))
    val wc = Window.orderBy(col("pattern"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pats.crossJoin(broadcast(tot))
      .withColumn("__c", sum(term).over(wc))
      .agg(max(col("n")).as("n_triples"),
        count(lit(1)).as("n_patterns"), max(col("__c")).as("h_nats"))
      .withColumn("h_norm", col("h_nats") / log(lit(6.0)))
  }

  /** Exponential goodness-of-fit of inter-event gaps (the memorylessness
    * check behind every Poisson-arrival assumption): λ̂ = n/Σg from exact
    * integer gap totals on a coarse time grid (the grid keeps the
    * distinct-value frame range-bounded), and the KS distance
    * sup|F_emp − (1 − e^{−λ̂·g})| over that frame — `exp` parity is the
    * risk-score precedent; the sup is an order-free max of per-value
    * doubles. One row: `n_gaps`, `sum_units`, `lambda_per_unit`, `ks_d`.
    */
  def exponentialFit(df: DataFrame, entityCol: String, orderCols: Seq[String],
                     tsMicros: Column, unitMicros: Long): DataFrame = {
    require(unitMicros >= 1, s"unitMicros must be >= 1, got $unitMicros")
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val gu = df
      .select(Seq(col(entityCol)) ++ orderCols.map(col) :+
        tsMicros.cast("long").as("__t"): _*)
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("__g").isNotNull)
      .select(expr(s"__g div $unitMicros").as("g"))
    val vals = gu.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val tot = vals.agg(sum(col("cnt")).as("n"),
      sum(col("g") * col("cnt")).as("sg"))
    val wv = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lam = col("n").cast("double") / col("sg").cast("double")
    val fEmp = col("__cum").cast("double") / col("n").cast("double")
    val fModel = lit(1.0) -
      exp((lit(0.0) - lam) * col("g").cast("double"))
    vals
      .withColumn("__cum", sum(col("cnt")).over(wv))
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_gaps"), max(col("sg")).as("sum_units"),
        max(when(col("sg") > 0, abs(fEmp - fModel))).as("ks_d"))
      .withColumn("lambda_per_unit",
        when(col("sum_units") > 0,
          col("n_gaps").cast("double") / col("sum_units").cast("double")))
      .select(col("n_gaps"), col("sum_units"), col("lambda_per_unit"),
        col("ks_d"))
  }

  /** Cross-correlation of two conditional event-count series on a coarse
    * time grid at lags 0..`maxLag` — "do errors follow purchases": hourly
    * (or any-unit) counts are exact; the lag pairing is one equi-join on
    * the shifted grid index; each lag's Pearson r assembles from exact
    * BIGINT moments in fixed operand order (the autocorrelation
    * discipline, across TWO metrics instead of one).
    */
  def crossCorrelation(df: DataFrame, tsMicros: Column, flagA: Column,
                       flagB: Column, unitMicros: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 64, s"maxLag must be in [0,64], got $maxLag")
    require(unitMicros >= 1, s"unitMicros must be >= 1, got $unitMicros")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = df
      .select(tsMicros.cast("long").as("__t"), flagA.as("__a"), flagB.as("__b"))
      .select(expr(s"__t div $unitMicros").as("h"), col("__a"), col("__b"))
      .groupBy(col("h"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lags = (0 to maxLag).map(_.toLong)
    val left = grid.select(col("h"), col("ca"),
      explode(array(lags.map(l => lit(l)): _*)).as("lag"))
      .withColumn("h2", col("h") + col("lag"))
    left.join(grid.select(col("h").as("h2"), col("cb")), Seq("h2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("ca")).as("sx"), sum(col("cb")).as("sy"),
        sum(dec(col("ca")) * dec(col("ca"))).as("sxx"),
        sum(dec(col("cb")) * dec(col("cb"))).as("syy"),
        sum(dec(col("ca")) * dec(col("cb"))).as("sxy"))
      .withColumn("xcorr", {
        val num = (dec(col("n")) * col("sxy") -
          dec(col("sx")) * dec(col("sy"))).cast("double")
        val dx = (dec(col("n")) * col("sxx") -
          dec(col("sx")) * dec(col("sx"))).cast("double")
        val dy = (dec(col("n")) * col("syy") -
          dec(col("sy")) * dec(col("sy"))).cast("double")
        when(dx > lit(0.0) && dy > lit(0.0), num / (sqrt(dx) * sqrt(dy)))
      })
      .select(col("lag"), col("n"), col("sx"), col("sy"), col("xcorr"))
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
      // peak_at_trough is anchored to the SAME earliest-trough row as
      // dd_pos (min_by on pos), never an independent max over the tied
      // rows — ties at the max drawdown can carry different running peaks.
      .agg(min(col("pos")).as("dd_pos"), max(col("__mdd")).as("max_drawdown"),
        min_by(col("__peak"), col("pos")).as("peak_at_trough"))
  }
}
