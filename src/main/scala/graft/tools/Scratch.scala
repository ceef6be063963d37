package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: anchor
  * shapes for q_source_overlap and q_ppjoin in the warm window that
  * reproduces the driver's readings (1.85 / 2.10). Hypothesis from the
  * q_link_prediction win: lazy MEMORY_AND_DISK persists on KB-to-MB-scale
  * intermediates cost more in cache-block management + lineage re-planning
  * than one eager localCheckpoint anchor.
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

    val docs = graft.Tables.documents(spark, dir)

    // ---- sourceOverlap shapes ----
    def soFin(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("src_a"), col("src_b"))
    def soBody(sh: org.apache.spark.sql.DataFrame) = {
      val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("n_shingles"))
      val shared = sh.as("a").hint("shuffle_hash")
        .join(sh.as("b").hint("shuffle_hash"),
          col("a.shingle") === col("b.shingle") && col("a.src") < col("b.src"))
        .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.select(col("src").as("src_a"), col("n_shingles").as("size_a")), "src_a")
        .join(sizes.select(col("src").as("src_b"), col("n_shingles").as("size_b")), "src_b")
        .withColumn("overlap",
          col("shared").cast("double") / least(col("size_a"), col("size_b")))
        .select("src_a", "src_b", "shared", "size_a", "size_b", "overlap")
    }
    time("SO A current") {
      graft.Bench.fullyEvaluate(soFin(graft.dedup.Dedup.sourceOverlap(docs, k = 5)))
    }
    time("SO B single anchor after distinct") {
      val sh = graft.dedup.Dedup.withShingles(docs, 5, idCol = "source", textCol = "text")
        .select(col("id").as("src"), explode(col("sh")).as("shingle"))
        .distinct()
        .localCheckpoint(true)
      graft.Bench.fullyEvaluate(soFin(soBody(sh)))
    }
    time("SO C arr anchor + sh anchor") {
      val arr = graft.dedup.Dedup.withShingles(docs, 5, idCol = "source", textCol = "text")
        .localCheckpoint(true)
      val sh = arr.select(col("id").as("src"), explode(col("sh")).as("shingle"))
        .distinct()
        .localCheckpoint(true)
      graft.Bench.fullyEvaluate(soFin(soBody(sh)))
    }

    // ---- ppjoin shapes ----
    import org.apache.spark.sql.expressions.Window
    val shArrPath = graft.queries.PipelineQueries.shinglesParquet(spark, dir)
    def shArr = graft.Tables.cachedParquet(spark, shArrPath)
    def ppFin(d: org.apache.spark.sql.DataFrame) = d.orderBy(col("id_a"), col("id_b"))
    time("PP A current") {
      graft.Bench.fullyEvaluate(ppFin(
        graft.dedup.Dedup.prefixFilterJaccardPairsFromShingles(shArr, threshold = 0.5)))
    }
    def ppBody(anchorSh: Boolean): org.apache.spark.sql.DataFrame = {
      val threshold = 0.5
      val sh0 = shArr
        .select(col("id"), size(col("sh")).cast("long").as("n_shingles"),
          explode(col("sh")).as("shingle"))
      val sh = if (anchorSh) sh0.localCheckpoint(true) else sh0
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("__f"))
      val ranked = sh.hint("shuffle_hash").join(freq.hint("shuffle_hash"), Seq("shingle"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("__f"), col("shingle"))))
        .filter(col("__rn") <=
          col("n_shingles") - ceil(lit(threshold) * col("n_shingles")).cast("long") + 1L)
        .select(col("id"), col("shingle"))
        .localCheckpoint(true)
      val cand = ranked.as("a").hint("shuffle_hash")
        .join(ranked.as("b").hint("shuffle_hash"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val arr = shArr.select(col("id"), col("sh"))
      val withA = arr
        .select(col("id").as("id_a"), col("sh").as("__sh_a"))
        .hint("shuffle_hash").join(cand.hint("shuffle_hash"), Seq("id_a"))
      val verified = arr
        .select(col("id").as("id_b"), col("sh").as("__sh_b"))
        .hint("shuffle_hash").join(withA.hint("shuffle_hash"), Seq("id_b"))
        .withColumn("intersection",
          size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("long"))
        .withColumn("size_a", size(col("__sh_a")).cast("long"))
        .withColumn("size_b", size(col("__sh_b")).cast("long"))
      verified
        .withColumn("jaccard",
          col("intersection").cast("double") /
            (col("size_a") + col("size_b") - col("intersection")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "size_a", "size_b", "jaccard")
    }
    time("PP B no sh persist, ranked anchored") {
      graft.Bench.fullyEvaluate(ppFin(ppBody(anchorSh = false)))
    }
    time("PP C sh anchored + ranked anchored") {
      graft.Bench.fullyEvaluate(ppFin(ppBody(anchorSh = true)))
    }
    spark.stop()
  }
}
