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
    val u32 = conv(substring(md5(rendered), 1, 8), 16, 10).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(u32).as("checksum"))
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
