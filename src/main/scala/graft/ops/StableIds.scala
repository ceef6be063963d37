package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Scale-safe global row numbering.
  *
  * The naive `row_number() OVER (ORDER BY ...)` is a scale-killer: an empty
  * window partition spec moves EVERY row through one task. The standard
  * distributed alternative is range-partition by the sort key, sort within
  * partitions, and `zipWithIndex` — one extra count job (one long per
  * partition) instead of a single-task sort, which is how a 100 TB corpus
  * gets contiguous training-example ids.
  *
  * Determinism: ids equal each row's position in the total order, so they
  * are independent of partition boundaries (range-partitioner sampling may
  * move a boundary; concatenated order is unchanged) — provided `sortCols`
  * is a total order (include a unique tiebreaker). `monotonically
  * _increasing_id` gives neither contiguity nor run-to-run stability —
  * don't use it for ids that persist.
  *
  * This is the one deliberate RDD drop in the library: `zipWithIndex` has
  * no Column-level equivalent, and the per-partition offset arithmetic is
  * genuine imperative-per-partition logic.
  */
object StableIds {

  /** `df` plus a contiguous 0-based `stable_id` following `sortCols`. */
  def withStableIds(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val parallelism = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parallelism, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = sorted.schema.add("stable_id", LongType, nullable = false)
    val withId = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withId, schema)
  }
}
