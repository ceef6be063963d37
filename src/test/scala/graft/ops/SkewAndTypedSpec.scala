package graft.ops

import graft.{SparkSpec, Tables}
import graft.score.{RiskScore, TypedRiskScore}
import graft.stream.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SkewAndTypedSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf()).withColumnRenamed("l_orderkey", "okey")
    val o = Tables.orders(spark, sf()).withColumnRenamed("o_orderkey", "okey")
    val salted = SkewJoin.saltedJoin(li, o, "okey", 8, col("l_linenumber"))
      .groupBy("okey").count()
    val plain = li.join(o, "okey").groupBy("okey").count()
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted join spreads a hot key across salt partitions") {
    val hot = (1 to 1000).map(i => (42L, i)).toDF("okey", "payload")
    val small = Seq((42L, "x")).toDF("okey", "v")
    val salts = SkewJoin.saltedJoin(hot, small, "okey", 8, col("payload"))
    assert(salts.count() == 1000)
    val distinctSalts = hot.withColumn("__salt",
        pmod(xxhash64(col("okey"), col("payload")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(distinctSalts > 4, s"hot key only used $distinctSalts salts")
  }

  test("salting spreads hot-key rows across shuffle partitions (100k-row hot key)") {
    // one key carrying half of all rows — the pathological case the salt
    // exists for; measured on the actual hash-partitioned layout the join
    // would shuffle into, not on salt values alone
    val n = 100000L
    val hot = spark.range(n).select(lit(42L).as("okey"), col("id").as("payload"))
    val cold = spark.range(n).select((col("id") % 1000 + 100L).as("okey"), col("id").as("payload"))
    val big = hot.unionAll(cold)

    def maxPartitionRows(df: org.apache.spark.sql.DataFrame,
                         keys: org.apache.spark.sql.Column*): Long =
      df.repartition(32, keys: _*)
        .groupBy(spark_partition_id().as("p")).count()
        .agg(max("count")).head.getLong(0)

    val maxUnsalted = maxPartitionRows(big, col("okey"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("okey"), col("payload")), lit(8L)).cast("int"))
    val maxSalted = maxPartitionRows(salted, col("okey"), col("__salt"))

    assert(maxUnsalted >= n, s"hot key not concentrated without salt: $maxUnsalted")
    assert(maxSalted <= n / 3,
      s"salt failed to spread the hot key: max partition holds $maxSalted of ${2 * n} rows")
  }

  test("typed Aggregator pipeline equals untyped risk aggregation") {
    val fact = graft.queries.TelematicsQueries.normalizedFact(spark, sf())
    val typed = TypedRiskScore.aggregate(spark, fact)
      .select("device_id", "report_date", "total_reports", "overspeed_reports", "night_reports")
    val untyped = RiskScore.aggregate(RiskScore.base(fact))
    assert(typed.exceptAll(untyped).count() == 0 && untyped.exceptAll(typed).count() == 0)
  }

  test("transformWithState (state v2) matches the v1 running totals cross-batch") {
    implicit val s = spark
    implicit val sql = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Double)]
    val q = StreamingIngest.runningDeviceTotalsV2(mem.toDS())
      .toDF("device_id", "n", "max_speed")
      .writeStream.format("memory").queryName("running_v2_out")
      .outputMode("update").start()
    try {
      mem.addData(("d7", 10.0), ("d7", 30.0), ("d9", 5.0))
      q.processAllAvailable()
      mem.addData(("d7", 20.0))
      q.processAllAvailable()
      val last = spark.table("running_v2_out")
        .groupBy("device_id").agg(max("n").as("n"), max("max_speed").as("m"))
        .as[(String, Long, Double)].collect()
        .map { case (k, n, m) => k -> ((n, m)) }.toMap
      // same cross-batch semantics as the v1 mapGroupsWithState operator
      assert(last("d7") == ((3L, 30.0)) && last("d9") == ((1L, 5.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    implicit val s = spark
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StreamingIngest.runningDeviceTotals(mem.toDS())
      .toDF("device_id", "n", "max_speed")
      .writeStream.format("memory").queryName("running_out").outputMode("update").start()
    try {
      mem.addData(("d7", 10.0), ("d7", 30.0), ("d9", 5.0))
      q.processAllAvailable()
      mem.addData(("d7", 20.0))
      q.processAllAvailable()
      val last = spark.table("running_out")
        .groupBy("device_id").agg(max("n").as("n"), max("max_speed").as("m"))
        .as[(String, Long, Double)].collect()
        .map { case (k, n, m) => k -> ((n, m)) }.toMap
      assert(last("d7") == ((3L, 30.0))) // state carried: 2 + 1 events, max from batch 1
      assert(last("d9") == ((1L, 5.0)))
    } finally q.stop()
  }
}
