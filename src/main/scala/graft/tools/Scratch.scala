package graft.tools

import graft.{SparkEntry, Tables}
import graft.dedup.{Dedup, MinHashLSH, SimHash}
import graft.queries.PipelineQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing for the heavy dedup queries. */
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).agg(sum(col("id"))).collect()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val aug = PipelineQueries.augmented(Tables.documents(spark, dir))
    (1 to 2).foreach { it =>
      println(s"--- iteration $it")
      val sh = Dedup.withShingles(aug, 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("shingles materialize")(sh.count())
      val sigs = MinHashLSH.signaturesFromShingles(sh, 64)
      time("signatures")(sigs.count())
      time("sigs+bands+cands")(MinHashLSH.candidatePairs(sigs, 16).count())
      time("full nearDuplicates")(MinHashLSH.nearDuplicatesFromShingles(sh, 64, 16).count())
      time("exact jaccard")(Dedup.jaccardPairsFromShingles(sh, 0.8, Int.MaxValue).count())
      time("simhash pairs")(SimHash.nearDuplicates(aug).count())
      spark.sharedState.cacheManager.clearCache()
      time("q_minhash_lsh full")(graft.Bench.fullyEvaluate(SparkEntry.queries("q_minhash_lsh")(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
      time("q_simhash full")(graft.Bench.fullyEvaluate(SparkEntry.queries("q_simhash")(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
      time("q_dedup_ngram_jaccard full")(graft.Bench.fullyEvaluate(SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
      time("ngram t=0.5 freq=1000 count")(Dedup.ngramJaccardPairs(aug, 5, 0.5).count())
      spark.sharedState.cacheManager.clearCache()
      time("ngram t=0.5 freq=1000 fullyEvaluate")(graft.Bench.fullyEvaluate(Dedup.ngramJaccardPairs(aug, 5, 0.5)))
      spark.sharedState.cacheManager.clearCache()
      time("ngram t=0.5 freq=1000 fullyEvaluate+orderBy")(graft.Bench.fullyEvaluate(
        Dedup.ngramJaccardPairs(aug, 5, 0.5).orderBy(col("id_a"), col("id_b"))))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
