package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: the
  * q_pipeline_e2e stage decomposition + plain-vs-broadcast id-list-join
  * ABAB that landed the broadcast shape (gate 0.78 / decon +0.96 /
  * budget +0.2; ABAB 2.81/2.29 plain vs 2.40/2.11 broadcast).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).agg(sum(col("id"))).collect()
    import graft.queries.PipelineQueries
    def pin8[T](f: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    import graft.text.TextAnalysis
    import graft.dedup.Dedup
    val s = spark

    def stages(upTo: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val aug = graft.Tables.cachedParquet(s, PipelineQueries.e2eCorpusParquet(s, dir))
      val drop0 = pin8 {
        val corpusFp = graft.Tables.cachedParquet(s, PipelineQueries.bloomCorpusFpParquet(s, dir))
        val deltaFp0 = graft.Tables.cachedParquet(s, PipelineQueries.bloomDeltaFpParquet(s, dir))
        val deltaFp = deltaFp0.unionByName(deltaFp0.filter(col("doc_id") >= 2000000L)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("fp")))
        val bits = PipelineQueries.bloomBitsMemoGet(s, dir)
        graft.dedup.BloomDedup.bloomProbe(bits, corpusFp, deltaFp,
            mBits = 1 << 16, k = 4)
          .filter(col("verdict") === "drop").select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 0) return drop0
      val s0 = aug.join(drop0, Seq("doc_id"), "left_anti")
      val keep1 = pin8 {
        s0.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 1) return keep1
      val drop2 = pin8 {
        graft.Tables.cachedParquet(s, PipelineQueries.dupPairsParquet(s, dir)).select("id_a", "id_b")
          .join(keep1.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
          .join(keep1.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
          .select(col("id_b").as("doc_id")).distinct()
          .localCheckpoint(true)
      }
      if (upTo == 2) return drop2
      val keep2 = keep1.join(drop2, Seq("doc_id"), "left_anti")
      val bench = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 97 === 3)
      val drop3 = pin8 {
        val pos2 = graft.Tables.cachedParquet(s, PipelineQueries.positionalShinglesParquet(s, dir))
          .join(keep2.select(col("doc_id").as("id")), Seq("id"), "left_semi")
        Dedup.benchmarkTokenRunsFromPositional(pos2, bench,
            k = 5, minRunTokens = 15)
          .select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 3) return drop3
      val keep3 = keep2.join(drop3, Seq("doc_id"), "left_anti")
      val q = TextAnalysis.qualityFeatures(
          aug.join(keep3, Seq("doc_id"), "left_semi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val low = q.filter(col("quality_score") < 0.5).select("doc_id")
      if (upTo == 4) return low
      val sel = pin8 {
        val w = Window.partitionBy(col("pred_lang"))
          .orderBy(col("quality_score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        q.filter(col("quality_score") >= 0.5)
          .withColumn("pred_lang", TextAnalysis.langId(col("text")))
          .withColumn("__cum", sum(col("n_tokens")).over(w))
          .select(col("doc_id"),
            when(col("__cum") <= 20000L, "selected").otherwise("over_budget")
              .as("fate"))
          .localCheckpoint(true)
      }
      if (upTo == 5) return sel
      drop0.select(col("doc_id"), lit("ingest_dup").as("fate"))
        .unionByName(s0.select("doc_id").join(keep1, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit("exact_dup").as("fate")))
        .unionByName(drop2.select(col("doc_id"), lit("near_dup").as("fate")))
        .unionByName(drop3.select(col("doc_id"), lit("contaminated").as("fate")))
        .unionByName(low.select(col("doc_id"), lit("low_quality").as("fate")))
        .unionByName(sel)
        .orderBy(col("doc_id"))
    }

    def stagesB(upTo: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val aug = graft.Tables.cachedParquet(s, PipelineQueries.e2eCorpusParquet(s, dir))
      val drop0 = pin8 {
        val corpusFp = graft.Tables.cachedParquet(s, PipelineQueries.bloomCorpusFpParquet(s, dir))
        val deltaFp0 = graft.Tables.cachedParquet(s, PipelineQueries.bloomDeltaFpParquet(s, dir))
        val deltaFp = deltaFp0.unionByName(deltaFp0.filter(col("doc_id") >= 2000000L)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("fp")))
        val bits = PipelineQueries.bloomBitsMemoGet(s, dir)
        graft.dedup.BloomDedup.bloomProbe(bits, corpusFp, deltaFp,
            mBits = 1 << 16, k = 4)
          .filter(col("verdict") === "drop").select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 0) return drop0
      val s0 = aug.join(broadcast(drop0), Seq("doc_id"), "left_anti")
      val keep1 = pin8 {
        s0.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 1) return keep1
      val drop2 = pin8 {
        graft.Tables.cachedParquet(s, PipelineQueries.dupPairsParquet(s, dir)).select("id_a", "id_b")
          .join(broadcast(keep1.select(col("doc_id").as("id_a"))), Seq("id_a"), "left_semi")
          .join(broadcast(keep1.select(col("doc_id").as("id_b"))), Seq("id_b"), "left_semi")
          .select(col("id_b").as("doc_id")).distinct()
          .localCheckpoint(true)
      }
      if (upTo == 2) return drop2
      val keep2 = keep1.join(broadcast(drop2), Seq("doc_id"), "left_anti")
      val bench = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 97 === 3)
      val drop3 = pin8 {
        val pos2 = graft.Tables.cachedParquet(s, PipelineQueries.positionalShinglesParquet(s, dir))
          .join(broadcast(keep2.select(col("doc_id").as("id"))), Seq("id"), "left_semi")
        Dedup.benchmarkTokenRunsFromPositional(pos2, bench,
            k = 5, minRunTokens = 15)
          .select("doc_id")
          .localCheckpoint(true)
      }
      if (upTo == 3) return drop3
      val keep3 = keep2.join(broadcast(drop3), Seq("doc_id"), "left_anti")
      val q = TextAnalysis.qualityFeatures(
          aug.join(broadcast(keep3), Seq("doc_id"), "left_semi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val low = q.filter(col("quality_score") < 0.5).select("doc_id")
      if (upTo == 4) return low
      val sel = pin8 {
        val w = Window.partitionBy(col("pred_lang"))
          .orderBy(col("quality_score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        q.filter(col("quality_score") >= 0.5)
          .withColumn("pred_lang", TextAnalysis.langId(col("text")))
          .withColumn("__cum", sum(col("n_tokens")).over(w))
          .select(col("doc_id"),
            when(col("__cum") <= 20000L, "selected").otherwise("over_budget")
              .as("fate"))
          .localCheckpoint(true)
      }
      if (upTo == 5) return sel
      drop0.select(col("doc_id"), lit("ingest_dup").as("fate"))
        .unionByName(s0.select("doc_id").join(broadcast(keep1), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit("exact_dup").as("fate")))
        .unionByName(drop2.select(col("doc_id"), lit("near_dup").as("fate")))
        .unionByName(drop3.select(col("doc_id"), lit("contaminated").as("fate")))
        .unionByName(low.select(col("doc_id"), lit("low_quality").as("fate")))
        .unionByName(sel)
        .orderBy(col("doc_id"))
    }

    Seq(("A plain", () => stages(6)), ("B broadcast", () => stagesB(6)),
      ("A plain2", () => stages(6)), ("B broadcast2", () => stagesB(6))).foreach { case (lbl, f) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.fullyEvaluate(f())
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"[scratch] e2e $lbl: min ${ts.min}%.2f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
