package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order-statistic quantiles in TWO PASSES, no global sort — the
  * scale-safe alternative to `row_number() OVER (ORDER BY v)` (one task
  * sorts the world) and to `approx_percentile` (not exact).
  *
  * Pass 1 histograms the column into fixed-width buckets: one map-combined
  * shuffle whose reduce side is ≤ (value range / bucketWidth) rows —
  * metadata-sized, so the cumulative-count window over it is a bounded
  * single task by construction (the same envelope as every 1-row gate in
  * the TPC-H suite). Pass 2 keeps ONLY the straddling bucket per quantile —
  * here via a broadcast-hash join on the derived bucket key (rows outside
  * the target buckets drop at the first post-scan operator); a deployment
  * that wants parquet row-group pruning on the second scan collects the
  * (quantile-count-sized) target rows and re-issues pass 2 with literal
  * `value BETWEEN b·w AND (b+1)·w` predicates — the bounded-driver-step
  * pattern, same envelope as the BPE round argmax. Either way the exact
  * in-bucket rank is a window bounded by one bucket's population. Total:
  * two scans, zero global sorts.
  *
  * Rank convention: `k(p‰) = ceil(n·p/1000)` (1-indexed lower quantile),
  * computed by integer cross-multiplication — never FP. Selection is by
  * VALUE at rank k, so tie order inside a bucket cannot change the answer.
  */
object Quantiles {

  /** Exact per-mille quantiles of `centsCol` (an exact BIGINT column —
    * callers convert money via DECIMAL, see [[graft.queries]] usage).
    * Returns one row per requested per-mille point with the total count,
    * the selected rank, and the exact value.
    */
  def exactQuantilesTwoPass(df: DataFrame, centsCol: String,
                            permille: Seq[Int], bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // NULL scores dropped pre-histogram (the rank-kernel discipline): a
    // NULL would form its own bucket and sort NULLS FIRST here, NULLS
    // LAST in a SQL mirror, skewing every rank after it
    val cents = df.select(col(centsCol).as("c"))
      .filter(col("c").isNotNull)
      .withColumn("bucket", expr(s"c div $bucketWidth"))
    // pass 1: bounded histogram + cumulative counts (metadata-sized frame)
    val hist = cents.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    exactQuantilesFromHistogram(hist, df, centsCol, permille, bucketWidth)
  }

  /** Exact k-th order statistic with a caller-supplied rank rule k(n) —
    * the [[exactQuantilesTwoPass]] machinery opened up for selections that
    * are not permille cuts (the conformal-calibration rank
    * ⌈(n+1)(1−α)⌉, winsorization bounds, top-k-th thresholds). Same
    * plan: bounded histogram, cumulative over the metadata-sized bucket
    * frame, ONE straddling bucket re-read. One row: `n`, `k`,
    * `value_cents`.
    */
  def exactOrderStatistic(df: DataFrame, centsCol: String,
                          rankFromN: Column => Column,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // NULL scores dropped pre-histogram — same rationale as
    // [[exactQuantilesTwoPass]]
    val cents = df.select(col(centsCol).as("c"))
      .filter(col("c").isNotNull)
      .withColumn("bucket", expr(s"c div $bucketWidth"))
    val hist = cents.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    // eager anchor on the metadata-sized cumulative frame: without it the
    // histogram subtree (a full pass-1 scan + shuffle agg) runs TWICE —
    // once under the cumulative window and once under the n-aggregate —
    // making the documented "two scans" three (r17 measurement). n is the
    // last cumulative count (summands are counts ≥ 1, monotone), read via
    // max_by per the fold-anchor rule.
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .localCheckpoint(true)
    val targets = cum.agg(max_by(col("cum"), col("bucket")).as("n"))
      .select(col("n"), rankFromN(col("n")).as("k"))
      .join(cum, col("k") > col("cum_prev") && col("k") <= col("cum"))
      .select(col("n"), col("k"), col("bucket"), col("cum_prev").as("below"))
    val inBucket = Window.partitionBy(col("k")).orderBy(col("c"))
    cents.join(broadcast(targets), Seq("bucket"))
      .withColumn("__rk", row_number().over(inBucket))
      .filter(col("__rk") === col("k") - col("below"))
      .select(col("n"), col("k"), col("c").as("value_cents"))
  }

  /** [[exactQuantilesTwoPass]] with pass 1's histogram supplied by the
    * caller — the entry point for INCREMENTALLY MAINTAINED quantiles: the
    * bucket histogram is add-mergeable (inserts +1, deletes −1 per
    * bucket), so a CDC delta fold can keep `hist` live without rescanning
    * the table, and only pass 2 — which touches nothing but the
    * straddling buckets, a pushed-down bucket filter on the base table —
    * reads data at query time. `hist(bucket, cnt)` must cover exactly the
    * rows of `df` (the oracle equality is what proves a delta-maintained
    * histogram ≡ the from-scratch rebuild).
    */
  def exactQuantilesFromHistogram(hist: DataFrame, df: DataFrame,
                                  centsCol: String, permille: Seq[Int],
                                  bucketWidth: Long): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille points must be in [1,1000], got $permille")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val cents = df.select(col(centsCol).as("c"))
      .withColumn("bucket", expr(s"c div $bucketWidth"))
    // eager anchor + last-cumulative n: one derivation of `hist` instead of
    // two (see exactOrderStatistic — same rationale; for caller-maintained
    // histograms the anchor is a cheap metadata materialization)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .localCheckpoint(true)
    val n = cum.agg(max_by(col("cum"), col("bucket")).as("n"))
    // one row per quantile: its rank and straddling bucket
    val targets = n
      .select(col("n"), explode(array(permille.map(p => lit(p)): _*)).as("p"))
      .withColumn("k", expr("(n * p + 999) div 1000"))
      .join(cum, col("k") > col("cum_prev") && col("k") <= col("cum"))
      .select(col("p"), col("n"), col("k"), col("bucket"),
        col("cum_prev").as("below"))
    // pass 2: only the straddling buckets are re-read; in-bucket exact rank
    val inBucket = Window.partitionBy(col("p")).orderBy(col("c"))
    cents.join(broadcast(targets), Seq("bucket"))
      .withColumn("__rk", row_number().over(inBucket))
      .filter(col("__rk") === col("k") - col("below"))
      .select(col("p"), col("n"), col("k"), col("c").as("value_cents"))
  }

  /** GROUPED exact quantiles, same two-pass shape per group: the histogram
    * keys on (group, bucket), the cumulative window partitions by group
    * (never global), and pass 2's in-bucket rank partitions by
    * (group, quantile) — stratified percentiles (per status / per source /
    * per day) without any group ever sorting more than one bucket.
    * `targets` is groups×quantiles rows — broadcast.
    */
  def exactGroupedQuantilesTwoPass(df: DataFrame, groupCol: String,
                                   centsCol: String, permille: Seq[Int],
                                   bucketWidth: Long): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille points must be in [1,1000], got $permille")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val cents = df.select(col(groupCol).as("grp"), col(centsCol).as("c"))
      .withColumn("bucket", expr(s"c div $bucketWidth"))
    val hist = cents.groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("cnt"))
    // eager anchor + per-group last-cumulative n: one derivation of `hist`
    // instead of two (see exactOrderStatistic — same rationale)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .localCheckpoint(true)
    val n = cum.groupBy(col("grp")).agg(max_by(col("cum"), col("bucket")).as("n"))
    val targets = n
      .select(col("grp"), col("n"),
        explode(array(permille.map(p => lit(p)): _*)).as("p"))
      .withColumn("k", expr("(n * p + 999) div 1000"))
      .join(cum, Seq("grp"))
      .filter(col("k") > col("cum_prev") && col("k") <= col("cum"))
      .select(col("grp"), col("p"), col("n"), col("k"), col("bucket"),
        col("cum_prev").as("below"))
    val inBucket = Window.partitionBy(col("grp"), col("p")).orderBy(col("c"))
    cents.join(broadcast(targets), Seq("grp", "bucket"))
      .withColumn("__rk", row_number().over(inBucket))
      .filter(col("__rk") === col("k") - col("below"))
      .select(col("grp"), col("p"), col("n"), col("k"), col("c").as("value_cents"))
  }

  /** WEIGHTED exact quantiles, same two-pass shape: the rank space is
    * cumulative weight (`k(p‰) = ceil(W·p/1000)`), pass 1 histograms
    * weight mass per bucket, and pass 2 selects — inside the straddling
    * bucket only — the smallest value whose running weight (over
    * per-distinct-value weight sums, so tie order cannot matter) reaches
    * the residual rank. The "median price weighted by quantity" /
    * token-weighted percentile primitive; weights must be non-negative
    * exact longs.
    */
  def exactWeightedQuantilesTwoPass(df: DataFrame, centsCol: String,
                                    weightCol: String, permille: Seq[Int],
                                    bucketWidth: Long): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille points must be in [1,1000], got $permille")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val cents = df.select(col(centsCol).as("c"), col(weightCol).as("wt"))
      .filter(col("c").isNotNull)
      .withColumn("bucket", expr(s"c div $bucketWidth"))
    val hist = cents.groupBy(col("bucket")).agg(sum(col("wt")).as("bw"))
    // NOT anchored (r17 A/B x3: anchor arm consistently +0.1-0.15 s on
    // q_weighted_quantiles): the two `hist` consumers below sit over the
    // IDENTICAL exchange, which ReuseExchange already dedupes — the eager
    // checkpoint only added its own job. Contrast exactOrderStatistic /
    // FromHistogram, where the anchor composes with multi-consumer callers.
    val cum = hist
      .withColumn("cum", sum(col("bw")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", col("cum") - col("bw"))
    val tot = hist.agg(sum(col("bw")).as("w"))
    val targets = tot
      .select(col("w"), explode(array(permille.map(p => lit(p)): _*)).as("p"))
      .withColumn("k", expr("(w * p + 999) div 1000"))
      .join(cum, col("k") > col("cum_prev") && col("k") <= col("cum"))
      .select(col("p"), col("w"), col("k"), col("bucket"),
        col("cum_prev").as("below"))
    // in-bucket: per distinct value weight, running sum in value order
    val perValue = cents.join(broadcast(targets), Seq("bucket"))
      .groupBy(col("p"), col("w"), col("k"), col("below"), col("c"))
      .agg(sum(col("wt")).as("vw"))
    val run = Window.partitionBy(col("p")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("__cumv", sum(col("vw")).over(run))
      .withColumn("__prevv", col("__cumv") - col("vw"))
      .filter(col("__prevv") < col("k") - col("below") &&
        col("k") - col("below") <= col("__cumv"))
      .select(col("p"), col("w"), col("k"), col("c").as("value_cents"))
  }
}
