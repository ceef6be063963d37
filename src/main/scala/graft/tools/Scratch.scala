package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target:
  * q_dedup_cross_snapshot volumes and stage split after the r13 rewrite).
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
    import graft.queries.VersionedQueries
    import graft.maintain.Versioned
    import org.apache.spark.storage.StorageLevel
    val shP = VersionedQueries.xsnapShinglesParquet(spark, dir)
    val tmp = VersionedQueries.xsnapFixture(spark, dir)
    val all0 = spark.read.parquet(shP)
    println("[scratch] docs in v2 shingle table: " + all0.count())
    val dIds = Versioned.snapshotDiff(spark, tmp, 1, 2)
      .filter(col("__change") === "insert").select(col("doc_id").as("id"))
      .localCheckpoint(true)
    println("[scratch] delta docs: " + dIds.count())
    val all = all0.persist(StorageLevel.MEMORY_AND_DISK)
    val dArr = all.join(broadcast(dIds), Seq("id"), "left_semi")
    val bArr = all.join(broadcast(dIds), Seq("id"), "left_anti")
    val dEx = dArr.select(col("id"), explode(col("sh")).as("s"))
    val bEx = bArr.select(col("id"), explode(col("sh")).as("s"))
    println("[scratch] delta exploded rows: " + dEx.count())
    println("[scratch] base exploded rows: " + bEx.count())
    val hot = bEx.select(col("s")).unionAll(dEx.select(col("s")))
      .groupBy(col("s")).agg(count(lit(1)).as("f")).filter(col("f") > 1000)
    println("[scratch] hot shingles: " + hot.count())
    val rhs = bEx.select(col("id").as("rid"), col("s"))
      .unionByName(dEx.select(col("id").as("rid"), col("s")))
    val coll = dEx.hint("shuffle_hash").join(rhs.hint("shuffle_hash"), Seq("s"))
    println("[scratch] collision rows (no cut, incl self): " + coll.count())
    (1 to 3).foreach { it =>
      time(s"[$it] full query") {
        graft.Bench.fullyEvaluate(
          graft.SparkEntry.queries("q_dedup_cross_snapshot")(spark, dir))
      }
    }
    spark.stop()
  }
}
