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

  test("interval ending exactly on a bin edge does not leak into the next bin") {
    val points = Seq((1L, 64L)).toDF("event_id", "pt") // first point of bin 1
    val intervals = Seq((1L, 0L, 64L)).toDF("interval_id", "lo", "hi") // [0,64) = bin 0 only
    assert(RangeJoin.pointInInterval(points, intervals, "pt", "lo", "hi", 64L).count() == 0)
  }
}
