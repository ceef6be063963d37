package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration and inequality measures beyond the Lorenz/Gini pair
  * already in [[Eval]]: the Herfindahl–Hirschman index (market/supplier
  * concentration — "is this corpus/supply dominated by a few sources")
  * and the Theil T index with its exact between/within group
  * decomposition (the additive inequality measure — "how much of the
  * imbalance is ACROSS nations vs INSIDE them").
  *
  * Oracle discipline: HHI is doubles-free until two final divisions
  * (Σshare² = Σs_i²/S², both numerator and denominator exact
  * DECIMAL(38,0), order-free sums — no fold anywhere). Theil's per-row
  * x·ln(x·n/S) terms are a DATA-SIZED double sum, which is
  * engine-divergent in any fold shape — so the log factor quantizes to
  * the floor-micro-nat grid and each contribution x·⌊ln(·)·10⁶⌋ is an
  * exact integer (the zipfFit/NgramLm discipline); totals are order-free
  * DECIMAL sums and every emitted statistic is a fixed-operand-order
  * expression over them.
  */
object Inequality {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** One row: `k` participants, `total` and `sum_sq` (canonical strings),
    * `hhi` = Σ(s_i/S)² and the 0–1 normalized `hhi_norm` = (HHI−1/k)/(1−1/k).
    */
  def herfindahl(df: DataFrame, keyCol: String, centsCol: String): DataFrame = {
    val s = df.groupBy(col(keyCol)).agg(sum(dec(col(centsCol))).as("s_i"))
    val kd = col("k").cast("double")
    val hhi = col("ssq").cast("double") /
      (col("total").cast("double") * col("total").cast("double"))
    s.agg(count(lit(1)).as("k"), sum(col("s_i")).as("total"),
        sum(col("s_i") * col("s_i")).as("ssq"))
      .withColumn("hhi", when(col("total").cast("double") > lit(0.0), hhi))
      .withColumn("hhi_norm",
        when(col("hhi").isNotNull && col("k") > 1,
          (col("hhi") - lit(1.0) / kd) / (lit(1.0) - lit(1.0) / kd)))
      .select(col("k"), col("total").cast("string").as("total"),
        col("ssq").cast("string").as("sum_sq"), col("hhi"), col("hhi_norm"))
  }

  /** Theil T over positive integer amounts with a group decomposition:
    * total T = (1/S)·Σ x·ln(x·n/S), between
    * T_b = Σ_g (S_g/S)·ln(S_g·n/(S·n_g)) (group frame fold — the groups
    * must be class-bounded), within T_w = Σ_g (S_g/S)·(1/S_g)·Σ_g x·ln(x·n_g/S_g).
    * Every ln factor is floor-micro-nat quantized so the data-sized sums
    * are exact; T ≈ T_b + T_w up to the documented quantization. Rows
    * with x ≤ 0 are excluded (ln domain) and counted in `n_dropped`.
    */
  def theilDecomposition(df: DataFrame, groupCol: String,
                         centsCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(centsCol).as("x"))
    val dropped = base.filter(col("x") <= 0).agg(count(lit(1)).as("n_dropped"))
    val ev = base.filter(col("x") > 0)
    val g = ev.groupBy(col("grp")).agg(count(lit(1)).as("n_g"),
      sum(dec(col("x"))).as("s_g"))
    val tot = g.agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
      sum(col("s_g")).as("s"))
    // per-row micro-nat contributions against global and group means
    val rows = ev.join(broadcast(g), Seq("grp")).crossJoin(broadcast(tot))
    def lq(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * lit(1e6)).cast("long")
    val contribTot = dec(col("x")) * dec(lq(dec(col("x")) * dec(col("n")), col("s")))
    val contribGrp = dec(col("x")) * dec(lq(dec(col("x")) * dec(col("n_g")), col("s_g")))
    val sums = rows.agg(sum(contribTot).as("ct"), sum(contribGrp).as("cw"))
    // between-group fold over the class-bounded group frame
    val wg = Window.orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val termB = (col("s_g").cast("double") / col("s").cast("double")) *
      log((col("s_g").cast("double") * col("n").cast("double")) /
        (col("s").cast("double") * col("n_g").cast("double")))
    // terms can be negative, so the total is the cumulative AT THE LAST
    // group (max_by on the group key), never a max over the fold
    val between = g.crossJoin(broadcast(tot))
      .withColumn("__c", sum(termB).over(wg))
      .agg(max_by(col("__c"), col("grp")).as("theil_between"))
    val sd = col("s").cast("double")
    tot.crossJoin(broadcast(sums)).crossJoin(broadcast(between))
      .crossJoin(broadcast(dropped))
      .select(col("n"), col("k"), col("n_dropped"),
        col("s").cast("string").as("total"),
        when(sd > lit(0.0),
          col("ct").cast("double") / (sd * lit(1e6))).as("theil_total"),
        col("theil_between"),
        when(sd > lit(0.0),
          col("cw").cast("double") / (sd * lit(1e6))).as("theil_within"))
  }
}
