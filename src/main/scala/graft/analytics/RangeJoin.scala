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
}
