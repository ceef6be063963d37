package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: same-window
  * A/B of AQE small-shuffle coalescing. With the default
  * `parallelismFirst=true`, AQE coalesces post-shuffle partitions only down
  * to the session parallelism (32 here), so a KB-scale shuffle still runs 32
  * tasks — pure scheduling overhead for the ~270 sub-second queries, and the
  * many-small-task profile is exactly the placement-sensitive variance class
  * (q_link_prediction 0.48 ↔ 3.19 across hosts at zero code change).
  * `parallelismFirst=false` + a smaller advisory size lets AQE size
  * partitions by ACTUAL bytes: KB shuffles → 1 task, the sf0.1 lineitem
  * shuffles (~100 MB) → advisory/8 MB ≈ 13 tasks. Both confs are runtime SQL
  * confs, so the A/B runs in ONE session, same window, interleaved.
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

    val qs = Seq("q1_pricing_summary", "q9_product_profit", "q_er_entities",
      "q_link_prediction", "q_ppjoin", "q_source_overlap", "q_hits",
      "q_knn_graph", "q_window_funcs", "q_bh_fdr", "q_page_count",
      "q_topk_orders")

    def setB(): Unit = {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8388608")
    }
    def setA(): Unit = {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
    }

    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.Bench.fullyEvaluate(graft.SparkEntry.queries(q)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      dt
    }

    // pass-major, A/B interleaved per pass so a host phase hits both arms
    val results = scala.collection.mutable.Map[String, (List[Double], List[Double])]()
      .withDefaultValue((Nil, Nil))
    (1 to 4).foreach { p =>
      System.err.println(s"[scratch] pass $p")
      qs.foreach { q =>
        setA(); val a = once(q)
        setB(); val b = once(q)
        val (as, bs) = results(q)
        results(q) = (a :: as, b :: bs)
      }
    }
    qs.foreach { q =>
      val (as, bs) = results(q)
      println(f"[scratch] $q%-22s A(min/med) ${as.min}%.2f/${as.sorted.apply(as.size / 2)}%.2f" +
        f"  B(min/med) ${bs.min}%.2f/${bs.sorted.apply(bs.size / 2)}%.2f  B/A ${bs.min / as.min}%.2f")
    }
    spark.stop()
  }
}
