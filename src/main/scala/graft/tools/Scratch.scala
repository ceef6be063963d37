package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (contents rotate per investigation — currently: extend the
  * eager-anchor playbook A/B to q_frequent_triples (two lazy persists) and
  * q_knn_graph (one lazy persist on the spread vector frame), in the same
  * warm window that priced them 2.04 / 1.72 in the clean r15 bench.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Kryo for shuffle/checkpoint blocks (the standard cluster default;
      // ABA-measured ~8-12% on the anchor/shuffle-heavy class, r15 NOTES)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).agg(sum(col("id"))).collect()

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"[scratch] $label%-34s min ${ts.min}%.2f  med ${ts.sorted.apply(ts.size / 2)}%.2f")
    }

    // ---- frequentTriples: current vs anchored ----
    def triplesAnchored(): org.apache.spark.sql.DataFrame = {
      val items = graft.queries.Graphs.baskets(spark, dir)
      val minSupport = 2L
      val baskets = items.select(col("basket"), col("item")).distinct()
      val nBaskets = baskets.select(col("basket")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val itemSupport = baskets.groupBy(col("item"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
      val frequent = baskets.join(itemSupport.select(col("item")), "item")
        .select(col("basket"), col("item"))
        .localCheckpoint(true)
      val fp = frequent.as("a").join(frequent.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("x"), col("b.item").as("y"))
        .agg(count(lit(1)).as("s"))
        .filter(col("s") >= minSupport)
        .select(col("x"), col("y"))
        .localCheckpoint(true)
      val ab = frequent.as("a").join(frequent.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .select(col("a.basket").as("basket"), col("a.item").as("ia"),
          col("b.item").as("ib"))
        .join(fp.select(col("x").as("ia"), col("y").as("ib")), Seq("ia", "ib"))
      val abc = ab
        .join(frequent.select(col("basket"), col("item").as("ic")), Seq("basket"))
        .filter(col("ib") < col("ic"))
        .join(fp.select(col("x").as("ia"), col("y").as("ic")), Seq("ia", "ic"))
        .join(fp.select(col("x").as("ib"), col("y").as("ic")), Seq("ib", "ic"))
      val tri = abc
        .groupBy(col("ia").as("item_a"), col("ib").as("item_b"),
          col("ic").as("item_c"))
        .agg(count(lit(1)).as("support_abc"))
        .filter(col("support_abc") >= minSupport)
        .join(itemSupport.select(col("item").as("item_a"),
          col("support").as("support_a")), "item_a")
        .join(itemSupport.select(col("item").as("item_b"),
          col("support").as("support_b")), "item_b")
        .join(itemSupport.select(col("item").as("item_c"),
          col("support").as("support_c")), "item_c")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      tri.crossJoin(broadcast(nBaskets))
        .select(col("item_a"), col("item_b"), col("item_c"), col("support_abc"),
          col("support_a"), col("support_b"), col("support_c"),
          ((dec(col("support_abc")) * col("n_baskets") * col("n_baskets"))
            .cast("double") /
            (dec(col("support_a")) * col("support_b") * col("support_c"))
              .cast("double")).as("lift"))
        .orderBy(desc("support_abc"), col("item_a"), col("item_b"), col("item_c"))
    }
    time("TRI A current") {
      graft.Bench.fullyEvaluate(graft.SparkEntry.queries("q_frequent_triples")(spark, dir))
    }
    time("TRI B anchored") {
      graft.Bench.fullyEvaluate(triplesAnchored())
    }

    // ---- knnGraph: current vs v-anchored ----
    time("KNN A current") {
      graft.Bench.fullyEvaluate(graft.SparkEntry.queries("q_knn_graph")(spark, dir))
    }
    spark.stop()
  }
}
