package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval range join: points ⋈ intervals containing them.
  *
  * The naive formulation (`point >= lo && point < hi` with no equi-key) plans
  * as BroadcastNestedLoopJoin — O(n·m), fatal at scale. The standard rewrite
  * bins both sides at a granularity `binWidth`: an interval registers in
  * every bin it overlaps, a point in its single bin, and the join becomes an
  * equi-join on bin plus the residual range predicate. Cost falls to
  * O(points + interval-bins + true matches) — the technique behind every
  * production range-join implementation (e.g. genomics overlap joins,
  * Databricks' range-join hint).
  *
  * `binWidth` trades replication (long intervals hit many bins) against
  * candidate precision; pick ~ the median interval length.
  */
object RangeJoin {

  /** Points (pointCol, long) ⋈ intervals [loCol, hiCol) — inner join. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val binnedPoints = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        // hi is exclusive: an interval ending exactly on a bin edge does not
        // reach into the next bin
        floor((col(hiCol) - 1) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pairs of half-open intervals `[loA, hiA) ×
    * [loB, hiB)` with non-empty intersection — the two-sided generalization
    * of [[pointInInterval]] (session × outage, trip × weather-window).
    * Both sides replicate into the bins they span and the join is an
    * equi-join on bin + the residual overlap predicate. A pair overlapping
    * several shared bins would match repeatedly, so each pair is counted
    * only in the bin where its intersection STARTS (`floor(max(loA, loB) /
    * binWidth)`) — duplicate-free without a distinct, keeping the operator
    * a pure join + filter (exactly-once by construction).
    *
    * Column names must be disjoint across the two inputs.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loA: String, hiA: String, loB: String, hiB: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(lo) / binWidth).cast("long"),
          floor((col(hi) - 1) / binWidth).cast("long"))))
    binned(left, loA, hiA).join(binned(right, loB, hiB), Seq("__bin"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA) &&
        col("__bin") === floor(greatest(col(loA), col(loB)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
