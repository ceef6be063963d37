package graft.maintain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("validate: per-rule counts, nulls count as violations, one agg plan") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, 15.0), (3L, null), (null, 2.0))
      .toDF("k", "v")
    val out = Expectations.validate(df, Seq(
      "v_le_10" -> (col("v") <= 10.0),
      "k_not_null" -> col("k").isNotNull))
    val m = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("v_le_10") === ((4L, 2L, 0.5)))    // 15.0 fails, null fails
    assert(m("k_not_null") === ((4L, 1L, 0.25)))
    // single-aggregate shape: exactly one Exchange (final agg), no join
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE repeats the plan; check final only
    assert(plan.split("Exchange").length <= 2, plan)
    assert(!plan.contains("Join"), plan)
  }
  test("integrity: fd violations, orphans, duplicate keys on crafted data") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (9L, "x")).toDF("k", "v")
    val parent = Seq(1L, 2L).toDF("k")
    assert(Integrity.orphans(child, "k", parent, "k")
      .as[(Long, String)].collect().toSeq == Seq((9L, "x")))
    val fd = Seq(("s1", "en"), ("s1", "es"), ("s2", "en")).toDF("src", "lang")
    val viol = Integrity.fdViolatingGroups(fd, "src", "lang").collect()
    assert(viol.length == 1 && viol.head.getString(0) == "s1" &&
      viol.head.getLong(1) == 2L)
    val dup = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val d = Integrity.duplicateKeys(dup, "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(2L -> 2L, 3L -> 3L))
  }
}
