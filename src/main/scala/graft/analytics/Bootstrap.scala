package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic multiplier bootstrap — the distributed way to put a
  * confidence interval on a mean without resampling rows (row resampling
  * needs n draws WITH replacement from a distributed table, i.e. a
  * global index; multiplier weights need only a per-row hash).
  *
  * Each (row, replicate) gets an integer weight w ~ Binomial(8, 1/8)
  * (mean 1 — the standard Poisson(1) bootstrap surrogate, Chamandy et
  * al., "Estimating Uncertainty for Massive Data Streams", Google 2012),
  * derived from 8 hex digits of the md5 of (seed, id, replicate) — the
  * library-wide reproducible-draw discipline, so every replicate
  * replays bit-exactly on any cluster and in the verification engine.
  * Replicate means are ratios of exact BIGINT sums; the CI bounds are
  * order statistics of those B means selected by cross-multiplied
  * integer ranks (no FP percentile arithmetic).
  *
  * Scale shape: the explode multiplies rows by B partition-locally, and
  * the per-replicate aggregate map-side combines before its single
  * shuffle — so shuffle traffic is O(partitions · B), not O(n · B), and
  * the rank/selection machinery runs on the B-row metadata frame (its
  * global window is over ≤ B rows BY CONSTRUCTION). Cost is one extra
  * O(n·B) CPU pass; pick B in the tens-to-hundreds.
  */
object Bootstrap {

  /** One row: `n`, `sum_cents`, `mean` (exact ratio), `b_used`, and the
    * `[loPermille, hiPermille]` percentile-bootstrap bounds `ci_lo`,
    * `ci_hi` over `replicates` deterministic replicate means.
    */
  def meanCI(df: DataFrame, idCol: Column, valueCents: Column, seed: String,
             replicates: Int = 64, loPermille: Int = 25,
             hiPermille: Int = 975): DataFrame = {
    require(replicates >= 2, s"need >= 2 replicates, got $replicates")
    require(0 < loPermille && loPermille < hiPermille && hiPermille <= 1000,
      s"need 0 < lo < hi <= 1000 permille, got ($loPermille, $hiPermille)")
    val base = df.select(idCol.cast("string").as("__id"),
      valueCents.cast("long").as("x"))
    val full = base
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"))
      .withColumn("mean",
        when(col("n") > 0,
          col("sum_cents").cast("double") / col("n").cast("double")))
    val digest = md5(concat(lit(s"boot:$seed:"), col("__id"), lit(":"),
      col("rep").cast("string")))
    // w = #{of the first 8 hex digits that land in {0,1}} ~ Binomial(8, 1/8)
    val w = (1 to 8).map(i =>
      when(substring(digest, i, 1).isin("0", "1"), 1L).otherwise(0L))
      .reduce(_ + _)
    val repMeans = base
      .select(col("__id"), col("x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("rep"))
      .withColumn("w", w)
      .groupBy(col("rep"))
      .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
      .withColumn("m",
        when(col("sw") > 0,
          col("swx").cast("double") / col("sw").cast("double")))
      .filter(col("m").isNotNull)
    // metadata frame: <= B rows from here on; globals are by construction
    val ranked = repMeans
      .withColumn("rn", row_number().over(Window.orderBy(col("m"), col("rep"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
    // rn >= ceil(cnt * p / 1000)  <=>  rn * 1000 >= cnt * p  (integers)
    val stats = ranked.agg(
      min(when(col("rn") * 1000 >= col("cnt") * loPermille, col("m"))).as("ci_lo"),
      min(when(col("rn") * 1000 >= col("cnt") * hiPermille, col("m"))).as("ci_hi"),
      max(col("cnt")).as("b_used"))
    full.crossJoin(broadcast(stats))
      .select(col("n"), col("sum_cents"), col("mean"), col("b_used"),
        col("ci_lo"), col("ci_hi"))
  }
}
