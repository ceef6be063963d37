package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("pairs: window membership, edit verification, hand-checked ranks") {
    // key order: ann(1), anne(3), bob(2), bobby(4), zed(5)
    val items = Seq((1L, "ann"), (2L, "bob"), (3L, "anne"), (4L, "bobby"),
      (5L, "zed")).toDF("rid", "name")
    val out = SortedNeighborhood.pairs(items, window = 1, maxDist = 2,
        keyCol = "name", idCol = "rid")
      .select($"id_a", $"id_b", $"rank_a", $"rank_b", $"dist")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // adjacent-in-order pairs within 2 edits: (ann,anne) d1, (bob,bobby) d2;
    // (anne,bob) d4 and (bobby,zed) d5 fail verification
    assert(out == Set((1L, 3L, 0L, 1L, 1L), (2L, 4L, 2L, 3L, 2L)))
  }

  test("pairs: banded equi-join equals the naive rank window; n·w candidate bound") {
    val items = (1L to 200L).map(i => (i, s"k${"%03d".format(i % 37)}"))
      .toDF("rid", "name")
    val w = 4
    val got = SortedNeighborhood.pairs(items, window = w, maxDist = 100,
        keyCol = "name", idCol = "rid")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // naive definition: global row_number order, all pairs within w ranks
    val ranked = items.orderBy($"name", $"rid").collect().map(_.getLong(0))
    val naive = (for {
      i <- ranked.indices; j <- (i + 1) to math.min(i + w, ranked.length - 1)
    } yield (ranked(i), ranked(j))).toSet
    assert(got == naive)
    assert(got.size == naive.size && naive.size <= 200 * w)
  }
}
