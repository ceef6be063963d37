package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive theta join") {
    val points = (0L until 500L).map(i => (i, i * 7L % 1000L)).toDF("event_id", "pt")
    val intervals = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 990L, 1000L),
      (4L, 0L, 1000L), (5L, 300L, 301L)).toDF("interval_id", "lo", "hi")
    val binned = RangeJoin.pointInInterval(points, intervals, "pt", "lo", "hi", binWidth = 64L)
      .select("event_id", "interval_id")
    val naive = points.crossJoin(intervals)
      .filter($"pt" >= $"lo" && $"pt" < $"hi")
      .select("event_id", "interval_id")
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
    assert(binned.count() > 0)
  }

  test("intervalOverlap equals naive theta join, exactly once across shared bins") {
    // long intervals spanning many shared bins at binWidth=8: each pair must
    // still come out exactly once (counted only in its overlap-start bin)
    val a = Seq((1L, 0L, 100L), (2L, 40L, 48L), (3L, 200L, 300L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 50L, 250L), (11L, 0L, 8L), (12L, 100L, 101L))
      .toDF("b_id", "b_lo", "b_hi")
    val binned = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .select("a_id", "b_id")
    val naive = a.crossJoin(b)
      .filter($"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
      .select("a_id", "b_id")
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
    // (1,10) shares bins 6..12 — exactly-once is the point of the start-bin guard
    assert(binned.count() == naive.count() && binned.count() == 3)
  }

  test("interval ending exactly on a bin edge does not leak into the next bin") {
    val points = Seq((1L, 64L)).toDF("event_id", "pt") // first point of bin 1
    val intervals = Seq((1L, 0L, 64L)).toDF("interval_id", "lo", "hi") // [0,64) = bin 0 only
    assert(RangeJoin.pointInInterval(points, intervals, "pt", "lo", "hi", 64L).count() == 0)
  }
}
