package graft.analytics

import graft.SparkSpec

/** Plan-shape pins for [[TpchSuite]] — the TPC-H remainder. Each assertion is
  * the property that keeps the query valid at 100 TB: pushdown reaching the
  * scan, correlated subqueries staying window/broadcast-shaped, EXISTS /
  * NOT EXISTS planning as semi/anti joins, and no unbounded product joins
  * (the only nested-loop joins allowed are broadcast 1-row scalar gates).
  */
class TpchSuiteSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: all three predicates push into the parquet scan; no join in the plan") {
    val p = plan(TpchSuite.forecastRevenue(spark, sf()))
    assert(p.contains("PushedFilters"), s"no pushdown section:\n$p")
    assert(p.contains("l_shipdate") && p.contains("l_discount") && p.contains("l_quantity"),
      s"predicates missing from scan:\n$p")
    assert(!p.contains("Join"), s"q6 must be a pure scan+agg:\n$p")
  }

  test("q2: correlated max is a window (no re-aggregation join), dims broadcast, no product") {
    val p = plan(TpchSuite.bestSupplierPerPart(spark, sf()))
    assert(p.contains("Window"), s"per-part max must be a window:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"part and supplier sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q2 planned a product join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q2 top-k must not global-sort:\n$p")
  }

  test("q21: EXISTS plans as LeftSemi and NOT EXISTS as LeftAnti on the order key") {
    val p = plan(TpchSuite.waitingSuppliers(spark, sf()))
    assert(p.contains("LeftSemi"), s"q21 EXISTS must be a semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"q21 NOT EXISTS must be an anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q21 planned a product join:\n$p")
  }

  test("q17: per-part stats broadcast back (no shuffle join on the fact); q20 windows the part total") {
    val p17 = plan(TpchSuite.smallQuantityRevenue(spark, sf()))
    assert("BroadcastHashJoin".r.findAllIn(p17).size >= 2,
      s"q17 must broadcast the brand parts and the stats table:\n$p17")
    val p20 = plan(TpchSuite.dominantSuppliers(spark, sf()))
    assert(p20.contains("Window"), s"q20 part total must be a window:\n$p20")
    assert(!p20.contains("CartesianProduct"), s"q20 planned a product join:\n$p20")
  }

  test("q11/q15/q22: scalar-subquery gates are broadcast 1-row joins, never driver collects") {
    // BroadcastNestedLoopJoin over a 1-row aggregate is the sanctioned shape;
    // an unbounded CartesianProduct is not.
    for ((name, df) <- Seq(
        "q11" -> TpchSuite.importantParts(spark, sf()),
        "q15" -> TpchSuite.topSupplier(spark, sf()),
        "q22" -> TpchSuite.dormantCustomers(spark, sf()))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name planned a product join:\n$p")
      assert(p.contains("Broadcast"), s"$name scalar gate must broadcast:\n$p")
    }
  }

  test("q13: zero-order customers survive the left outer join") {
    import org.apache.spark.sql.functions._
    // The distribution must count every customer exactly once.
    val dist = TpchSuite.orderCountDistribution(spark, sf())
    val total = dist.agg(sum(col("custdist"))).head.getLong(0)
    val nCust = graft.Tables.customer(spark, sf()).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("q10: top-k plans as TakeOrderedAndProject with broadcast dims") {
    val p = plan(TpchSuite.returnedItems(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), s"q10 must not global-sort:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer and nation must broadcast:\n$p")
  }

  test("q15 returns every co-maximal supplier (exact-decimal tie semantics)") {
    // The equality gate is on exact decimals: rerunning must give the same
    // row set, and every returned revenue equals the max.
    val r1 = TpchSuite.topSupplier(spark, sf()).collect()
    val r2 = TpchSuite.topSupplier(spark, sf()).collect()
    assert(r1.map(_.getLong(0)).toSet == r2.map(_.getLong(0)).toSet)
    assert(r1.map(_.getDouble(2)).distinct.length == 1,
      "all returned suppliers must share the maximal revenue")
  }
}
