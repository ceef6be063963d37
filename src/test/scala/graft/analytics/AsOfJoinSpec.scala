package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dates(rows: (String, String)*) =
    rows.map { case (k, d) => (k, java.sql.Date.valueOf(d)) }

  test("backward as-of join picks the most recent right row per key") {
    val left = dates(("d1", "2024-01-05"), ("d1", "2024-01-10"), ("d1", "2024-01-20"),
      ("d2", "2024-01-05"), ("d3", "2024-01-05")).toDF("k", "t")
    val right = dates(("d1", "2024-01-01"), ("d1", "2024-01-10"), ("d1", "2024-01-15"),
      ("d2", "2024-01-06")).toDF("k", "rt")
      .withColumn("v", concat(col("k"), lit("@"), col("rt").cast("string")))
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), col("t"), col("rt"))
      .select(col("k"), col("t").cast("string"), col("v"))
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("d1", "2024-01-05", "d1@2024-01-01"), // between rows → earlier one
      ("d1", "2024-01-10", "d1@2024-01-10"), // exact match → same day
      ("d1", "2024-01-20", "d1@2024-01-15"), // after last → last
      ("d2", "2024-01-05", null),            // before first → null (left join)
      ("d3", "2024-01-05", null)))           // key absent on right → null
  }

  test("as-of join never fans out (≤1 match per left row)") {
    val left = dates(("d1", "2024-01-10")).toDF("k", "t")
    val right = dates(("d1", "2024-01-01"), ("d1", "2024-01-02"), ("d1", "2024-01-03"))
      .toDF("k", "rt")
    assert(AsOfJoin.asOfJoin(left, right, Seq("k"), col("t"), col("rt")).count() == 1)
  }
}
