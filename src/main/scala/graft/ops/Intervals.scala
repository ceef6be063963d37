package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage (gaps-and-islands): merge a group's overlapping
  * or touching intervals into islands and measure what they cover — device
  * uptime from heartbeat leases, user engagement from session intervals,
  * sensor coverage from report windows (the telematics lake's natural
  * "how much of the day did we hear from this device" question).
  *
  * One window partitioned by the group key does everything: an interval
  * starts a new island iff its start exceeds the running max of all
  * previous ends (classic gaps-and-islands), the island id is the running
  * sum of those starts, and one aggregate per (group, island) then per
  * group finishes. Two shuffles total, both on the group key; per-group
  * work is a sort — the windowed-rank caveat (a single monster group
  * serializes) applies and is the accepted shape for per-entity timelines.
  * All arithmetic is on exact integer bounds (epoch micros in practice).
  */
object Intervals {

  /** Per-group: interval count, merged-island count, covered total
    * (Σ island extents — overlaps counted once). Inclusive-touching: an
    * interval starting exactly at a previous end extends the island.
    */
  def coverage(df: DataFrame, groupCol: String, startCol: String,
               endCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(groupCol), col("__island"))
      .agg(count(lit(1)).as("__n"), min(col(startCol)).as("__s"),
        max(col(endCol)).as("__e"))
    islands.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered"))
  }
}
