package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing scratchpad (current target: q_pipeline_e2e per-stage
  * split and pin A/Bs; previously the q_hits drift adjudication).
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
    import graft.queries.PipelineQueries
    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    val aug = PipelineQueries.augmented(graft.Tables.documents(spark, dir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    aug.count()
    val keep1 = aug.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("s1 exact dedup agg")(keep1.agg(count(lit(1))).collect())
    keep1.count()
    val shP = PipelineQueries.shinglesParquet(spark, dir)
    time("s2 jaccard over survivors") {
      val sh1 = spark.read.parquet(shP)
        .join(keep1.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      graft.Bench.fullyEvaluate(
        Dedup.jaccardPairsFromShingles(sh1, threshold = 0.5)
          .select(col("id_b")).distinct())
    }
    val posP = PipelineQueries.positionalShinglesParquet(spark, dir)
    val bench = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 97 === 3)
    time("s3 decon UNPINNED") {
      val pos2 = spark.read.parquet(posP)
        .join(keep1.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      graft.Bench.fullyEvaluate(
        Dedup.benchmarkTokenRunsFromPositional(pos2, bench, 5, 15).select("doc_id"))
    }
    def pin8[T](f: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    time("s3 decon PINNED8") {
      pin8 {
        val pos2 = spark.read.parquet(posP)
          .join(keep1.select(col("doc_id").as("id")), Seq("id"), "left_semi")
        Dedup.benchmarkTokenRunsFromPositional(pos2, bench, 5, 15)
          .select("doc_id").localCheckpoint(true)
      }
    }
    time("s4 quality") {
      graft.Bench.fullyEvaluate(
        TextAnalysis.qualityFeatures(aug.join(keep1, Seq("doc_id"), "left_semi"))
          .select(col("doc_id"), col("quality_score"), col("n_tokens")))
    }
    time("s5 lang+budget window") {
      import org.apache.spark.sql.expressions.Window
      val q = TextAnalysis.qualityFeatures(aug.join(keep1, Seq("doc_id"), "left_semi"))
        .filter(col("quality_score") >= 0.5)
        .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      val w = Window.partitionBy(col("pred_lang"))
        .orderBy(col("quality_score").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.Bench.fullyEvaluate(q.withColumn("__cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), when(col("__cum") <= 20000L, "selected").otherwise("over_budget").as("fate")))
    }
    spark.stop()
  }
}
