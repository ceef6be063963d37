package graft.analytics

import graft.SparkSpec

/** Physical-plan shape assertions: the plans we want at 100 TB, not just the
  * first ones that pass (builder prompt: explain-and-iterate).
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5 broadcasts all four dimension joins") {
    val p = plan(StarQueries.localSupplierVolume(spark, sf()))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts in:\n$p")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan(StarQueries.pricingSummary(spark, sf()))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("q1 scan prunes to only referenced columns") {
    val p = StarQueries.pricingSummary(spark, sf())
      .queryExecution.executedPlan.toString
    // ReadSchema must not include unused columns like l_comment-ish extras
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && read.contains("l_quantity"), read)
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(StarQueries.topOrders(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("risk-score pipeline plans exactly one shuffle (the device-day agg)") {
    import graft.queries.TelematicsQueries
    import graft.score.RiskScore
    val df = RiskScore.pipeline(TelematicsQueries.normalizedFact(spark, sf()))
    val exchanges = "Exchange".r.findAllIn(plan(df)).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n${plan(df)}")
    assert(plan(df).contains("partial_count") || plan(df).contains("HashAggregate"))
  }

  test("bucketed embedding dedup never plans a nested-loop join") {
    import graft.sim.Similarity
    val df = Similarity.bucketedThresholdPairs(
      graft.Tables.embeddings(spark, sf()), 0.6, bands = 4, planesPerBand = 4)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"full-corpus dedup must be a bucketed equi-join, got:\n$p")
  }

  test("latest-per-device plans a single shuffle on device_id") {
    import graft.queries.TelematicsQueries
    val df = graft.serve.Api.latestPerDevice(
      TelematicsQueries.normalizedFact(spark, sf()),
      org.apache.spark.sql.functions.col("correlation_id").cast("long"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges")
  }
}
