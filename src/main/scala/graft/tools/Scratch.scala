package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: stage
  * decomposition of the bloom delta-dedup query).
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
    def pin8[T](f: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    import graft.dedup.BloomDedup
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    time("s1 corpus fp scan only") {
      docs.select(md5(col("text")).as("fp")).agg(count(lit(1))).collect()
    }
    time("s2 bitmap aggregator") {
      BloomDedup.corpusBloom(docs.select(md5(col("text")).as("fp")), 1 << 16, 4)
    }
    val deltaRaw = graft.queries.PipelineQueries.augDeltaSlice(docs)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    time("s3 delta build + checkpoint") {
      deltaRaw.localCheckpoint(true).count()
    }
    val delta = deltaRaw.localCheckpoint(true)
    val corpus = docs.select(md5(col("text")).as("fp"))
    time("s4 full kernel UNPINNED") {
      graft.Bench.fullyEvaluate(
        BloomDedup.bloomDeltaDedup(corpus, delta, 1 << 16, 4).orderBy("doc_id"))
    }
    time("s5 full kernel PINNED8") {
      pin8 { graft.Bench.fullyEvaluate(
        BloomDedup.bloomDeltaDedup(corpus, delta, 1 << 16, 4).orderBy("doc_id")) }
    }
    BloomDedup.bloomDeltaDedup(corpus, delta, 1 << 16, 4).explain("formatted")
    spark.stop()
  }
}
