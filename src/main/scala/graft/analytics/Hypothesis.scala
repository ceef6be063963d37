package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-comparison test statistics — the "did this cohort/data-drop change"
  * gates a training pipeline runs before promoting a new mixture: the
  * Kruskal–Wallis rank test (non-parametric, k groups), the one-way ANOVA
  * F (parametric companion), and categorical mutual information /
  * normalized MI (feature-informativeness screening).
  *
  * Oracle discipline (the r9 lesson, applied throughout): every statistic
  * is assembled from EXACT integer aggregates (BIGINT, DECIMAL(38,0)
  * internally — never emitted); any cross-row double summation rides an
  * ORDERED cumulative window over a frame that is metadata-sized by
  * construction (k groups, class² cells, value-range-bounded distinct
  * scores), so both engines replay the identical IEEE fold. Wide integers
  * leave as canonical strings.
  *
  * Scale shape: each statistic is one map-side-combined aggregate on a
  * bounded key (group, cell, or distinct cent value) plus broadcasts of
  * one-row totals — no data-sized shuffle beyond the initial combine, no
  * global sort (ranks come from the value-range-bounded distinct-score
  * frame, the [[Quantiles]] histogram discipline).
  */
object Hypothesis {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Kruskal–Wallis H across the groups of `grpCol` on integer scores
    * `centsCol`. Tie-aware: ranks are average ranks carried as exact
    * twice-ranks (2·cum_prev + cnt + 1) on the distinct-score frame, so
    * Σ ranks per group is exact DECIMAL; H folds the k per-group
    * R_i²/n_i terms in group order. One row: `n`, `k`, `tie_num`
    * (Σ(t³−t) as canonical string — it overflows BIGINT at petabyte
    * row counts), `h`, and the tie-corrected `h_tie`.
    */
  def kruskalWallis(df: DataFrame, grpCol: String, centsCol: String): DataFrame = {
    val ev = df.select(col(grpCol).as("grp"), col(centsCol).as("cents"))
    val vals = ev.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vals
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("trank", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
    val ties = ranked.agg(
      sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt")) - dec(col("cnt")))
        .as("tie_dec"))
    val g = ev.join(broadcast(ranked.select(col("cents"), col("trank"))), Seq("cents"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_i"), sum(dec(col("trank"))).as("sr2"))
    val tot = g.agg(sum(col("n_i")).as("n"), count(lit(1)).as("k"))
    val wg = Window.orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = (col("sr2").cast("double") * col("sr2").cast("double")) /
      (lit(4.0) * col("n_i").cast("double"))
    val nd = col("n").cast("double")
    val h = lit(12.0) / (nd * (nd + lit(1.0))) * col("rterm") -
      lit(3.0) * (nd + lit(1.0))
    val tieC = lit(1.0) - col("tie_d") / col("nden")
    g.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .withColumn("__cum", sum(term).over(wg))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        max(col("tie_dec")).as("tie_dec"), max(col("__cum")).as("rterm"))
      .withColumn("nden",
        (dec(col("n")) * dec(col("n")) * dec(col("n")) - dec(col("n"))).cast("double"))
      .withColumn("tie_d", col("tie_dec").cast("double"))
      .select(col("n"), col("k"), col("tie_dec").cast("string").as("tie_num"),
        when(col("n") > 1 && col("k") > 1, h).as("h"),
        when(col("n") > 1 && col("k") > 1 && tieC > lit(0.0), h / tieC).as("h_tie"))
  }

  /** One-way ANOVA F of integer scores `centsCol` across `grpCol`: exact
    * per-group (n_i, Σx, Σx²) in DECIMAL(38,0); between/within sums of
    * squares assembled from the k-group ordered fold of s_i²/n_i. One
    * row: `n`, `k`, `sum_cents`/`sumsq_cents` (canonical strings — Σx²
    * overflows BIGINT past ~10⁸ rows at cent scale), `ssb`, `ssw`, `f`.
    */
  def anovaF(df: DataFrame, grpCol: String, centsCol: String): DataFrame = {
    val ev = df.select(col(grpCol).as("grp"), col(centsCol).as("cents"))
    val g = ev.groupBy(col("grp")).agg(count(lit(1)).as("n_i"),
      sum(dec(col("cents"))).as("s_i"),
      sum(dec(col("cents")) * dec(col("cents"))).as("q_i"))
    val tot = g.agg(sum(col("n_i")).as("n"), count(lit(1)).as("k"),
      sum(col("s_i")).as("s_all"), sum(col("q_i")).as("q_all"))
    val wg = Window.orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = (col("s_i").cast("double") * col("s_i").cast("double")) /
      col("n_i").cast("double")
    val sd = col("s_all").cast("double")
    val ssb = col("rterm") - (sd * sd) / col("n").cast("double")
    val ssw = col("q_all").cast("double") - col("rterm")
    g.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(term).over(wg))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        max(col("s_all")).as("s_all"), max(col("q_all")).as("q_all"),
        max(col("__cum")).as("rterm"))
      .withColumn("ssb", ssb)
      .withColumn("ssw", ssw)
      .select(col("n"), col("k"),
        col("s_all").cast("string").as("sum_cents"),
        col("q_all").cast("string").as("sumsq_cents"),
        col("ssb"), col("ssw"),
        when(col("k") > 1 && col("n") > col("k") && col("ssw") > lit(0.0),
          (col("ssb") / (col("k") - lit(1L)).cast("double")) /
            (col("ssw") / (col("n") - col("k")).cast("double"))).as("f"))
  }

  /** Mutual information (nats) between two categorical columns, with the
    * marginal entropies and normalized MI = I/min(H_a, H_b). Cell counts
    * and marginals are exact BIGINTs; the three double folds (cells, row
    * marginals, column marginals) each ride an ordered cumulative over
    * their class-bounded frames. `ln` parity between engines is the
    * established BM25/DSIR precedent. One row: `n`, `mi_nats`, `h_a`,
    * `h_b`, `nmi`.
    */
  def mutualInformation(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cm = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rT = cm.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val cT = cm.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cm.agg(sum(col("o")).as("n"))
    val nd = col("n").cast("double")
    val wCell = Window.orderBy(col("a"), col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val miTerm = (col("o").cast("double") / nd) *
      log((col("o").cast("double") * nd) /
        (col("r").cast("double") * col("c").cast("double")))
    val mi = cm.join(broadcast(rT), Seq("a")).join(broadcast(cT), Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("__cum", sum(miTerm).over(wCell))
      .agg(max(col("n")).as("n"), max(col("__cum")).as("mi_nats"))
    def entropy(m: DataFrame, key: String, cnt: String, out: String): DataFrame = {
      val w = Window.orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = (lit(0.0) - col(cnt).cast("double") / nd) *
        log(col(cnt).cast("double") / nd)
      m.crossJoin(broadcast(tot))
        .withColumn("__cum", sum(t).over(w))
        .agg(max(col("__cum")).as(out))
    }
    mi.crossJoin(broadcast(entropy(rT, "a", "r", "h_a")))
      .crossJoin(broadcast(entropy(cT, "b", "c", "h_b")))
      .withColumn("nmi",
        when(least(col("h_a"), col("h_b")) > lit(0.0),
          col("mi_nats") / least(col("h_a"), col("h_b"))))
  }
}
