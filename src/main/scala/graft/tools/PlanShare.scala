package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: split per-query wall time into plan-build + optimize vs
  * execution, to see whether driver-side planning is a systemic cost.
  * Usage: runMain graft.tools.PlanShare <q1,q2,...> <sfDir> [iters]
  */
object PlanShare {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',')
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).count()
    names.foreach { q =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        val agg = df.agg(org.apache.spark.sql.functions.call_function("bit_xor",
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.struct(
              df.columns.map(org.apache.spark.sql.functions.col).toSeq: _*))))
        agg.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        agg.collect()
        val t3 = System.nanoTime()
        spark.sharedState.cacheManager.clearCache()
        println(f"[planshare] $q iter $i: build=${(t1-t0)/1e9}%.2f plan=${(t2-t1)/1e9}%.2f exec=${(t3-t2)/1e9}%.2f total=${(t3-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
