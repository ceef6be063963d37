package graft.plans

import graft.SparkSpec
import graft.maintain.Layout
import graft.queries.TelematicsQueries
import org.apache.spark.sql.functions._

class InjectPartitionGuardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val factDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_ipg").toString + "/fact"
    Layout.writeFact(TelematicsQueries.normalizedFact(spark, sf()), d)
    d
  }

  private def withRule[T](optIn: Boolean = true)(f: => T): T = {
    val rule = InjectPartitionGuard()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    if (optIn) InjectPartitionGuard.optIn(spark, factDir)
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == rule)
      spark.conf.unset(InjectPartitionGuard.PathsConfKey)
    }
  }

  test("gps_epoch range filter gains a received_day partition guard") {
    withRule() {
      val df = spark.read.parquet(factDir)
        .filter($"gps_epoch" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          $"gps_epoch" < lit("2024-01-12 00:00:00").cast("timestamp"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("received_day"), optimized)
      val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PartitionFilters") && scan.contains("received_day"),
        s"guard did not reach partition pruning:\n$scan")
    }
  }

  test("injected guard never changes results (implied predicate)") {
    val pred = ($"gps_epoch" >= lit("2024-01-10 00:00:00").cast("timestamp")) &&
      ($"gps_epoch" < lit("2024-01-12 00:00:00").cast("timestamp"))
    val base = spark.read.parquet(factDir).filter(pred)
      .select("correlation_id").as[String].collect().sorted.toSeq
    val guarded = withRule() {
      spark.read.parquet(factDir).filter(pred)
        .select("correlation_id").as[String].collect().sorted.toSeq
    }
    assert(base.nonEmpty && guarded == base)
  }

  test("rule is idempotent and skips filters already constraining the day") {
    withRule() {
      val df = spark.read.parquet(factDir)
        .filter($"gps_epoch" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          $"received_day" === lit("2024-01-10").cast("date"))
      val optimized = df.queryExecution.optimizedPlan.toString
      // exactly the one user-written received_day predicate family; the rule
      // must not stack another guard on top
      assert(!optimized.contains("date_add"), optimized)
    }
  }

  test("rule is a no-op for tables that did not opt in (late-data safety)") {
    withRule(optIn = false) {
      val df = spark.read.parquet(factDir)
        .filter($"gps_epoch" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          $"gps_epoch" < lit("2024-01-12 00:00:00").cast("timestamp"))
      val cond = df.queryExecution.optimizedPlan.collectFirst {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c.toString
      }.getOrElse("")
      assert(!cond.contains("received_day"), cond)
    }
  }

  test("writeFact rejects tables violating the skew contract the guard assumes") {
    val fact = TelematicsQueries.normalizedFact(spark, sf())
    // a device that uploaded 10 days late — exactly the row the guard would
    // silently drop if the contract were not enforced at write time
    val late = fact.limit(1)
      .withColumn("received_day", date_add($"received_day", 10))
    val dir = java.nio.file.Files.createTempDirectory("graft_ipg_bad").toString
    val err = intercept[IllegalArgumentException] {
      Layout.writeFact(fact.unionByName(late), dir + "/bad")
    }
    assert(err.getMessage.contains("violate"))
    // opt-out path still writes
    Layout.writeFact(fact.unionByName(late), dir + "/ok", skewGuardDays = -1)
    assert(spark.read.parquet(dir + "/ok").count() == fact.count() + 1)
  }
}
