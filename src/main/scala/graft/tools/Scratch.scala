package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target: what does
  * re-tokenizing `documents` cost per pass vs reading a materialized
  * token-array parquet).
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
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    val docs = Tables.documents(spark, dir)
    val p = "/tmp/graft_scratch_toks"
    docs.select(col("doc_id"), col("source"),
        split(col("text"), "\\s+").as("toks"))
      .write.mode("overwrite").parquet(p)
    (1 to 3).foreach { it =>
      time(s"[$it] docs scan only (count rows)") {
        docs.agg(count(lit(1))).collect()
      }
      time(s"[$it] split+explode+term agg FROM TEXT") {
        docs.select(explode(split(col("text"), "\\s+")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)))
          .agg(count(lit(1)), sum(col("count(1)"))).collect()
      }
      time(s"[$it] explode+term agg FROM TOKEN PARQUET") {
        spark.read.parquet(p).select(explode(col("toks")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)))
          .agg(count(lit(1)), sum(col("count(1)"))).collect()
      }
    }
    spark.stop()
  }
}
