package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target: the
  * q_er_entities hot path — blocked Levenshtein join vs CC rounds).
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
    val keys = docs.select(col("doc_id"), substring(col("text"), 1, 20).as("k0"))
    val twins = keys.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(substring(col("k0"), 1, 10), lit("X"),
          substring(col("k0"), 12, 9)).as("k0"))
    (1 to 3).foreach { it =>
      time(s"[$it] keys+twins count") {
        keys.unionByName(twins).agg(count(lit(1))).collect()
      }
      var pairsCkpt: org.apache.spark.sql.DataFrame = null
      time(s"[$it] editDistancePairs + ckpt") {
        pairsCkpt = graft.dedup.Dedup.editDistancePairs(
            keys.unionByName(twins), "k0", maxDist = 3, prefixLen = 6)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
      }
      time(s"[$it] CC pinned 8") {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try graft.dedup.DupClusters.connectedComponents(pairsCkpt)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_records"), sum(col("id")).as("sum_ids"))
          .agg(count(lit(1))).collect()
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
    spark.stop()
  }
}
