package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking for record linkage (Hernández/Stolfo's
  * merge/purge): order records by a blocking key, then compare each record
  * only against its `window` successors in that order. The candidate count
  * is EXACTLY n·window regardless of the key distribution — the property
  * the equi-key families (PassJoin segments in
  * [[graft.text.Curation.fuzzyPairs]], shingle/LSH blocking in
  * [[graft.dedup.Dedup]]) cannot promise when a key is hot. The price is
  * recall that depends on the sort key putting true matches near each
  * other; production linkage runs several passes with different keys and
  * unions the pair sets.
  *
  * Scale shape: the global order comes from [[StableIds]] (range-partition
  * + zipWithIndex) — the oracle's naive `row_number()` over an empty
  * partition spec IS the single-task plan this avoids (the
  * `QuantileNorm` precedent). The neighborhood join is rank-banded into an
  * equi-join: block = rank div window; a pair within `window` ranks spans
  * at most adjacent blocks, so probing block and block+1 is lossless, each
  * record lands in ≤ 2 candidate buckets, and no rank inequality ever
  * reaches a nested-loop join.
  */
object SortedNeighborhood {

  /** Candidate pairs within `window` positions in `keyCol` order (ties
    * broken by `idCol`), verified by bounded `levenshtein ≤ maxDist` on the
    * key — Spark's threshold form early-exits, so verification cost is
    * O(maxDist·len) per candidate, not O(len²).
    */
  def pairs(items: DataFrame, window: Int, maxDist: Int,
            keyCol: String, idCol: String): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val ranked = StableIds.withStableIds(
        items.select(col(idCol).as("id"), col(keyCol).as("k")), Seq("k", "id"))
      .select(col("id"), col("k"), col("stable_id").as("rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = ranked.select(col("id").as("id_a"), col("k").as("key_a"),
        col("rank").as("rank_a"))
      .withColumn("__blk",
        explode(array(expr(s"rank_a div ${window}L"),
          expr(s"rank_a div ${window}L") + 1L)))
    val right = ranked.select(col("id").as("id_b"), col("k").as("key_b"),
        col("rank").as("rank_b"))
      .withColumn("__blk", expr(s"rank_b div ${window}L"))
    left.join(right, Seq("__blk"))
      .filter(col("rank_b") > col("rank_a") &&
        col("rank_b") <= col("rank_a") + window)
      // ONE banded computation serves both the cut and the emitted value
      // (the banded form returns the exact distance whenever it is ≤ the
      // bound, -1 otherwise)
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("rank_a"), col("rank_b"),
        col("key_a"), col("key_b"), col("dist"))
  }
}
