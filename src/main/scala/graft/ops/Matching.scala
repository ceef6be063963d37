package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Observational-study matching: exact 1-nearest-neighbor control for
  * every treated unit on a scalar matching score — the propensity-style
  * matched-pairs construction behind before/after effect estimates when
  * randomized assignment isn't available.
  *
  * In one dimension the exact nearest neighbor is always one of the two
  * adjacent controls in score order, so matching needs NO pair join at
  * all: two (stratum, score) sorts (forward and reversed), one `IGNORE
  * NULLS` growing-frame lookup on each (nearest control at-or-before /
  * strictly-after), and a pure projection picking the closer side —
  * O(n log n) total versus the O(treated·controls) naive join, with
  * every frame incremental (no shrinking-frame quadratic re-aggregation). Matching is WITH replacement (a
  * popular control may serve several treated units — disclosed; greedy
  * without-replacement matching is inherently sequential). Ties break
  * toward the earlier (lower-score, then lower-id) control, so results
  * are partitioning-invariant.
  *
  * Emits one row per treated unit: its stratum, id, `score`, the matched
  * `control_id`/`control_score` (NULL when the stratum has no control),
  * and the exact integer `match_dist`.
  */
object Matching {

  def nearestControl(df: DataFrame, strataCol: Column, idCol: Column,
                     scoreCents: Column, treated: Column): DataFrame = {
    val base = df.select(strataCol.as("stratum"), idCol.as("id"),
      scoreCents.cast("long").as("score"), treated.cast("boolean").as("__t"))
    // both lookups are GROWING frames (unboundedPreceding → current):
    // Spark evaluates those incrementally in O(rows), while a shrinking
    // (1, unboundedFollowing) frame recomputes its aggregate per row —
    // O(rows²) per partition, measured 139 s on 30k-row strata at sf0.1.
    // "Nearest control strictly after" in ascending order IS "nearest
    // control strictly before" under the REVERSED sort, so the next-side
    // lookup rides a second sort instead of a quadratic frame.
    val fwd = Window.partitionBy(col("stratum"))
      .orderBy(col("score"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val bwd = Window.partitionBy(col("stratum"))
      .orderBy(col("score").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ctrl = when(!col("__t"), struct(col("score"), col("id")))
    base
      .withColumn("__prev", last(ctrl, ignoreNulls = true).over(fwd))
      .withColumn("__next", last(ctrl, ignoreNulls = true).over(bwd))
      .filter(col("__t"))
      .withColumn("__pd",
        when(col("__prev").isNotNull, col("score") - col("__prev.score")))
      .withColumn("__nd",
        when(col("__next").isNotNull, col("__next.score") - col("score")))
      .withColumn("__pick",
        when(col("__pd").isNotNull &&
          (col("__nd").isNull || col("__pd") <= col("__nd")), col("__prev"))
          .otherwise(col("__next")))
      .select(col("stratum"), col("id"), col("score"),
        col("__pick.id").as("control_id"),
        col("__pick.score").as("control_score"),
        // distance to the PICKED side, as an explicit CASE: Spark's
        // least() IGNORES a NULL side while SQL least() propagates it, so
        // a stratum-edge treated unit (control on one side only) would
        // silently diverge from the oracle under a bare least()
        when(col("__pd").isNotNull &&
          (col("__nd").isNull || col("__pd") <= col("__nd")), col("__pd"))
          .otherwise(col("__nd")).as("match_dist"))
  }
}
