package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: hitsQ
  * kernel-shape A/B on the current host, where in-bench q_hits reads
  * 2.2-2.7 vs 1.3 on the previous night's host at zero code change).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    spark.range(1L << 20).agg(sum(col("id"))).collect()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $label #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    def pin8[T](f: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    def edges = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    def fin(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("authority2").desc, col("node")).limit(10)

    time("A current hybrid (ckpt wide + pin8 kernel)") {
      val e = edges.localCheckpoint(true)
      pin8 { graft.Bench.fullyEvaluate(
        fin(graft.dedup.DupClusters.hits(e)).localCheckpoint(true)) }
    }
    time("B all wide, no ckpt") {
      graft.Bench.fullyEvaluate(fin(graft.dedup.DupClusters.hits(edges)))
    }
    time("C all pin8, no ckpt") {
      pin8 { graft.Bench.fullyEvaluate(
        fin(graft.dedup.DupClusters.hits(edges)).localCheckpoint(true)) }
    }
    time("D ckpt wide + wide kernel") {
      val e = edges.localCheckpoint(true)
      graft.Bench.fullyEvaluate(fin(graft.dedup.DupClusters.hits(e)))
    }
    spark.stop()
  }
}
