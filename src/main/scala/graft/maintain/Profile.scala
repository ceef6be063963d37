package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiler — one summary row per column (row count, null count,
  * exact distinct count, min/max rendered canonically). The audit that runs
  * before a table is admitted to the lake, and the exact companion to the
  * sketch profile ([[graft.queries]] `q_approx_distinct` / `q_quantiles`).
  *
  * Shape: one aggregate PER COLUMN, unioned — each branch is a
  * column-pruned parquet scan (`ReadSchema` carries exactly one column), so
  * the branches parallelize independently and no branch pays for another's
  * width. The alternative single-pass multi-`count(DISTINCT)` aggregate
  * expands every row ×columns through one shuffle — strictly worse when the
  * scan is columnar. At 100 TB, swap the exact `count(DISTINCT)` for the
  * mergeable HLL sketch path (`q_approx_distinct`) per column and keep this
  * exact profile for the partitions ANALYZE touches.
  *
  * Min/max render: strings pass through; integers/dates via plain cast
  * (canonical text both engines); doubles through DECIMAL(18,2) so both
  * engines print scale-2 decimal text rather than engine-specific float
  * formatting.
  */
object Profile {

  sealed trait Render
  case object AsString extends Render
  case object AsDecimal2 extends Render
  case object AsDate extends Render

  /** Order-independent per-group content checksum: row count plus the sum
    * of an md5-derived 32-bit value over a canonical `|`-joined rendering
    * of `cols` — the anti-entropy check for comparing two copies of a
    * table (replication, backfill vs streaming, pre/post-migration)
    * without moving either. Sum, not xor-fold, so the checksum is
    * partition-order-independent; one shuffle on the group key with
    * map-side combine. Columns must be non-null (render with coalesce
    * upstream if not) — a null poisons the whole row's rendering.
    */
  def tableChecksum(df: DataFrame, groupCol: String,
                    cols: Seq[String]): DataFrame = {
    val rendered = concat_ws("|", cols.map(col): _*)
    val u32 = graft.functions.Md5Field.md5U32(rendered)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(u32).as("checksum"))
  }

  /** Equi-DEPTH histogram: k tiles of (near-)equal row count with exact
    * min/max boundaries — the selectivity-estimation companion to the
    * equi-width `histogram` (equi-width starves on skew; equi-depth puts
    * the resolution where the data is). Tile assignment is the explicit
    * `tile = (rank·k) div n` on exact longs over a [[graft.ops.StableIds]]
    * global rank — NOT `ntile()` over an empty window spec, which funnels
    * every row through one task (the oracle's naive form IS that plan; the
    * `QuantileNorm` precedent). Counts per tile differ by at most 1 and
    * the assignment is a pure function of (rank, n), so boundaries
    * hash-compare.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: Column, k: Int,
                         idCol: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = df.select(valueCol.cast("long").as("__v"), col(idCol))
    val ranked = graft.ops.StableIds.withStableIds(v, Seq("__v", idCol))
    val total = v.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("tile", expr(s"(stable_id * ${k}L) div __n"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** Join-key skew audit: per-key frequency distribution summarized as the
    * exact Gini coefficient plus the hot-key share — the planning
    * diagnostic that decides between a plain shuffle join, broadcast, or
    * [[graft.ops.SkewJoin]] salting BEFORE a 100 TB shuffle is launched.
    * `G = (2S − (K+1)T) / (K·T)` with `S = Σ rank·freq` over
    * ascending-frequency ranks: ranks come from [[graft.ops.StableIds]] on
    * the (already aggregated, much smaller) frequency table, `S` accumulates
    * in DECIMAL(38) (rank·freq can pass 2⁶³ long before K does), and the
    * Gini is ONE fixed operand-order IEEE division of exact integers —
    * hash-comparable. Tie order among equal frequencies cannot change `S`,
    * so the statistic is well-defined despite the arbitrary key tiebreak.
    */
  def skewAudit(df: DataFrame, keyCol: String): DataFrame = {
    val freq = df.groupBy(col(keyCol)).agg(count(lit(1)).as("f"))
    val ranked = graft.ops.StableIds.withStableIds(
        freq.select(col("f"), col(keyCol)), Seq("f", keyCol))
      .withColumn("i", col("stable_id") + 1L)
    def dec(c: Column) = c.cast("decimal(38,0)")
    ranked.agg(
        sum(col("f")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("f")).as("max_freq"),
        sum(dec(col("i")) * col("f")).as("__s"))
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        (col("max_freq").cast("double") / col("n_rows").cast("double"))
          .as("top_share"),
        ((lit(2).cast("decimal(38,0)") * col("__s") -
          dec(col("n_keys") + 1) * col("n_rows")).cast("double") /
          (dec(col("n_keys")) * col("n_rows")).cast("double")).as("gini"))
  }

  /** Per-column profile rows for `columns` of `df`. */
  def columnProfile(df: DataFrame, columns: Seq[(String, Render)]): DataFrame =
    columns.map { case (name, render) =>
      val c = col(name)
      def s(x: Column): Column = render match {
        case AsString   => x.cast("string")
        case AsDecimal2 => x.cast("decimal(18,2)").cast("string")
        case AsDate     => x.cast("date").cast("string")
      }
      df.select(c).agg(
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(c).as("n_distinct"),
        s(min(c)).as("min_val"),
        s(max(c)).as("max_val"))
        .select(lit(name).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
}
