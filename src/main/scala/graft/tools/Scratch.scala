package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target: q_hits stage
  * split for the r13→r14 drift adjudication).
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
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $label #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    import org.apache.spark.storage.StorageLevel
    val e0 = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    time("join only")(e0.agg(count(lit(1))).collect())
    time("join+distinct")(e0.distinct().agg(count(lit(1))).collect())
    time("full hits") {
      graft.Bench.fullyEvaluate(
        graft.dedup.DupClusters.hits(e0)
          .orderBy(col("authority2").desc, col("node")).limit(10))
    }
    time("hybrid: wide e build + checkpoint, pinned message passing") {
      val e = e0.localCheckpoint(true)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val out = try graft.dedup.DupClusters.hits(e)
          .orderBy(col("authority2").desc, col("node")).limit(10)
          .localCheckpoint(true)
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.Bench.fullyEvaluate(out)
    }
    val eP = e0.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    eP.count()
    time("hits AFTER e cached (3 joins+aggs only)") {
      val a1 = eP.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
      val h1 = eP.join(a1, Seq("dst")).groupBy(col("src")).agg(sum(col("a1")).as("h1"))
      val a2 = eP.join(h1, Seq("src")).groupBy(col("dst")).agg(sum(col("h1")).as("a2"))
      val r = a1.join(a2, Seq("dst"), "left_outer")
        .select(col("dst").as("node"), col("a1").as("authority1"),
          coalesce(col("a2"), lit(0L)).as("authority2"))
        .orderBy(col("authority2").desc, col("node")).limit(10)
      r.collect()
    }
    spark.stop()
  }
}
