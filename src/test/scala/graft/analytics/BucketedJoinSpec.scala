package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the shuffle-elimination story from README
  * "Design for 100 TB" — writing both join sides bucketed by the key lets the
  * join run with zero Exchange.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables.lineitem(spark, sf()).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    Tables.orders(spark, sf()).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      try {
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").count()
        val plan = joined.queryExecution.executedPlan.toString
        val exchangesBeforeAgg = plan.linesIterator
          .dropWhile(l => !l.contains("SortMergeJoin"))
          .count(_.contains("Exchange hashpartitioning"))
        assert(plan.contains("SortMergeJoin"), plan)
        assert(exchangesBeforeAgg == 0,
          s"bucketed join still shuffles its inputs:\n$plan")
        // and it is correct
        val expected = Tables.lineitem(spark, sf())
          .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").count()
        assert(joined.exceptAll(expected).count() == 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
