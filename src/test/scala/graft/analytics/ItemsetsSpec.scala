package graft.analytics

import graft.SparkSpec
import graft.maintain.Profile
import org.apache.spark.sql.functions._

class ItemsetsSpec extends SparkSpec {

  test("frequentPairs counts planted co-occurrences with apriori prune") {
    import spark.implicits._
    // baskets: {1,2,3} x3, {1,2} x1, {9,10} x1  (9,10 infrequent at minSupport=2...
    // item 9 and 10 appear once -> pruned before the join)
    val items = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 1L), (103L, 2L), (103L, 2L), // dup within basket collapses
      (104L, 9L), (104L, 10L)
    ).toDF("basket", "item")
    val res = Itemsets.frequentPairs(items, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(res.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val (sAb, sA, sB, lift) = res((1L, 2L))
    assert(sAb === 4L && sA === 4L && sB === 4L)
    assert(lift === (4.0 * 5.0) / (4.0 * 4.0)) // 5 baskets total
    assert(res((1L, 3L))._1 === 3L)
  }

  test("frequentTriples: pair-frequent-but-triple-infrequent is rejected by the count") {
    import spark.implicits._
    // {1,2,3} x2 -> triple (1,2,3) support 2. Then pairs (4,5),(4,6),(5,6)
    // are each frequent via DIFFERENT baskets, but {4,5,6} never co-occurs:
    // the classic apriori candidate the counting pass must kill.
    val items = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L),
      (200L, 4L), (200L, 5L), (201L, 4L), (201L, 5L),
      (202L, 4L), (202L, 6L), (203L, 4L), (203L, 6L),
      (204L, 5L), (204L, 6L), (205L, 5L), (205L, 6L)
    ).toDF("basket", "item")
    val res = Itemsets.frequentTriples(items, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(7))).toMap
    assert(res.keySet === Set((1L, 2L, 3L)))
    val (s, lift) = res((1L, 2L, 3L))
    assert(s === 2L)
    assert(lift === (2.0 * 8.0 * 8.0) / (2.0 * 2.0 * 2.0)) // 8 baskets
  }

  test("frequentPairs plan: equi-join on basket, no cartesian") {
    val li = graft.Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_partkey"))
    val plan = Itemsets.frequentPairs(li, "l_orderkey", "l_partkey", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop join allowed is the 1-row n_baskets envelope cross
    assert(plan.split("BroadcastNestedLoopJoin").length <= 2, plan)
    // the pair-generating join must be a hash equi-join on the basket key
    assert(plan.contains("HashJoin [basket"), plan)
  }

  test("columnProfile: nulls, exact distinct, canonical rendering") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 2.5, "a"), (2L, null, "b"), (null, 4.0, "b"))
      .toDF("k", "v", "s")
    val rows = Profile.columnProfile(df, Seq(
        "k" -> Profile.AsString, "v" -> Profile.AsDecimal2,
        "s" -> Profile.AsString))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("k").getAs[Long]("n_nulls") === 1L)
    assert(rows("k").getAs[Long]("n_distinct") === 2L)
    assert(rows("v").getAs[String]("min_val") === "2.50")
    assert(rows("v").getAs[String]("max_val") === "4.00")
    assert(rows("s").getAs[Long]("n_distinct") === 2L)
    assert(rows("s").getAs[Long]("n_rows") === 3L)
  }
  test("equiDepthHistogram: tile populations within 1, exact boundaries") {
    import spark.implicits._
    val df = (1L to 10L).map(v => (v, v)).toDF("v", "rid")
    val out = Profile.equiDepthHistogram(df, col("v"), k = 5, idCol = "rid")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 2L, 1L, 2L), (1L, 2L, 3L, 4L), (2L, 2L, 5L, 6L),
      (3L, 2L, 7L, 8L), (4L, 2L, 9L, 10L)))
    // non-divisible n: counts differ by at most 1, tiles cover all rows
    val odd = Profile.equiDepthHistogram(
        (1L to 13L).map(v => (v, v)).toDF("v", "rid"), col("v"), 4, "rid")
      .as[(Long, Long, Long, Long)].collect()
    assert(odd.map(_._2).sum == 13L && odd.map(_._2).max - odd.map(_._2).min <= 1)
  }

  test("skewAudit: uniform keys gini 0, hand-computed skew case") {
    import spark.implicits._
    val uniform = Seq("a", "a", "b", "b").toDF("k")
    val u = Profile.skewAudit(uniform, "k")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(u == ((4L, 2L, 2L, 0.5, 0.0)))
    // f = (1, 3): S = 1·1 + 2·3 = 7, G = (14 - 3·4)/(2·4) = 0.25
    val skewed = Seq("a", "b", "b", "b").toDF("k")
    val s = Profile.skewAudit(skewed, "k")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(s == ((4L, 2L, 3L, 0.75, 0.25)))
  }

  test("columnProfile branches scan exactly one column each") {
    val li = graft.Tables.lineitem(spark, sf())
    val plan = Profile.columnProfile(li, Seq(
        "l_orderkey" -> Profile.AsString,
        "l_quantity" -> Profile.AsDecimal2))
      .queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, plan)
    schemas.foreach { rs =>
      assert(!rs.contains(","), s"profile branch scans more than one column: $rs")
    }
  }
}
