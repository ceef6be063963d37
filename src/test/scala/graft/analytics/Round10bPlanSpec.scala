package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape pins for the round-10 continuation operators — the
  * properties that keep them valid at 100 TB: no window over a data-sized
  * group frame where the exact-integer path was the point, broadcast
  * where a small side was claimed, a single window pass where the sums
  * were said to share one frame.
  */
class Round10bPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("iccOneWay: NO window anywhere — the entity-sized between term is pure aggregation") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("grp", "cents")
    val p = plan(Hypothesis.iccOneWay(df, "grp", "cents"))
    assert(!p.contains("Window"), s"ICC must not plan a window:\n$p")
    assert(p.contains("HashAggregate"), s"ICC should hash-aggregate:\n$p")
  }

  test("rollingRegression: ONE Window node carries all four sums") {
    val df = (1 to 20).map(i => ("u", i, i.toLong)).toDF("u", "t", "yv")
    val p = plan(Correlation.rollingRegression(df, "u", Seq("t"), col("yv"), 8))
    val windows = "Window ".r.findAllIn(p).size
    // row_number and the frame sums may plan as two Window nodes over the
    // SAME partitioning (one exchange); more than two means the frame was
    // split per-sum
    assert(windows <= 2, s"rolling sums must share window passes ($windows):\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"one entity-key exchange only:\n$p")
  }

  test("kruskalWallis: the rank map joins back BROADCAST (value-range bounded)") {
    val df = Seq(("a", 10L), ("a", 20L), ("b", 30L), ("b", 40L)).toDF("grp", "cents")
    val out = Hypothesis.kruskalWallis(df, "grp", "cents")
    out.collect() // finalize AQE
    val p = plan(out).split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"rank map must broadcast:\n$p")
  }

  test("cvmTwoSample: no product join; the cumulative window is over the distinct-score frame") {
    val df = Seq((true, 10L), (false, 20L), (true, 30L)).toDF("a", "c")
    val out = Hypothesis.cvmTwoSample(df, col("a"), "c")
    out.collect()
    val p = plan(out).split("== Initial Plan ==").head
    // only 1-row broadcasts may cross: the totals frame plus the
    // value-domain guard's count (round-11 envelope) — never a cartesian
    val products = "CartesianProduct|BroadcastNestedLoop".r.findAllIn(p).size
    assert(products <= 3, s"cvm planned $products products:\n$p")
    assert(!p.contains("CartesianProduct"), s"non-broadcast product:\n$p")
  }

  test("maxDrawdown: two window passes over one entity exchange, no shrinking frame") {
    val df = Seq(("u", 1, 10L), ("u", 2, 5L)).toDF("u", "t", "cents")
    val p = plan(graft.ops.TimeSeries.maxDrawdown(df, "u", "t", "t", col("cents")))
    assert(!p.contains("1 FOLLOWING AND UNBOUNDED FOLLOWING"),
      s"shrinking frame (O(n²) trap):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"drawdown should reuse the entity partitioning:\n$p")
  }

  test("herfindahl: aggregation only — no window, no join") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("key", "cents")
    val p = plan(Inequality.herfindahl(df, "key", "cents"))
    assert(!p.contains("Window") && !p.contains("Join"),
      s"HHI must be two aggregates:\n$p")
  }

  test("gumbelFit + oddsRatio: single-aggregate plans, no exchange beyond the final reduce") {
    val bm = Seq(10L, 20L).toDF("day_max")
    val p1 = plan(Hypothesis.gumbelFit(bm, "day_max"))
    assert(!p1.contains("Window") && !p1.contains("Join"), s"gumbel plan:\n$p1")
    val ev = Seq((true, true), (false, false)).toDF("r", "c")
    val p2 = plan(Hypothesis.oddsRatio(ev, col("r"), col("c")))
    assert(!p2.contains("Window") && !p2.contains("Join"), s"odds plan:\n$p2")
  }
}
