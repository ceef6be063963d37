package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev scratchpad (contents rotate per investigation — currently: the r17
  * OPTIMIZATION-round A/B harness, batch 3: anchored vs pre-change shapes
  * for associationRules / BLEU / ROUGE, and the heapsCurve reshape. Same
  * discipline as batches 1-2: exact equality asserted once, then arms
  * interleaved x iters in one JVM with cache clears.)
  *
  * Usage: Scratch <experiment|all> [iters]
  */
object Scratch {
  private def buildSpark(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Scratch <experiment|all> [iters]")
      return
    }
    val which = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = buildSpark()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def rowsOf(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    def runExp(name: String, oldArm: () => DataFrame, newArm: () => DataFrame): Unit = {
      val a = rowsOf(oldArm())
      spark.sharedState.cacheManager.clearCache()
      val b = rowsOf(newArm())
      spark.sharedState.cacheManager.clearCache()
      if (a != b) {
        println(s"[ab] $name: NOT EQUAL old=${a.size} new=${b.size} " +
          s"missing=${a.diff(b).take(3)} extra=${b.diff(a).take(3)}")
        return
      }
      println(s"[ab] $name: equal (${a.size} rows); timing $iters interleaved")
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        graft.Bench.fullyEvaluate(oldArm())
        val ta = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        val t1 = System.nanoTime()
        graft.Bench.fullyEvaluate(newArm())
        val tb = (System.nanoTime() - t1) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"[ab] $name iter $i: old=$ta%.2f new=$tb%.2f")
      }
    }

    // --- old shapes --------------------------------------------------------

    /** Bootstrap.meanCI with the pre-r17 four-digest weight draw (four
      * md5_field expressions per (row, replicate-group) — each re-digests
      * the message — and the 8-conditional per-field digit<2 fold), for the
      * md5BinWeights4 A/B. Everything after the weights is identical.
      */
    def bootOld(): DataFrame = {
      val df = graft.Tables.events(spark, dir)
      val idCol = col("event_id")
      val valueCents = round(col("value") * 100, 0).cast("long")
      val seed = "s1"
      val replicates = 64
      val loPermille = 25
      val hiPermille = 975
      val base = df.select(idCol.cast("string").as("__id"),
        valueCents.cast("long").as("x"))
      val full = base
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"))
        .withColumn("mean",
          when(col("n") > 0,
            col("sum_cents").cast("double") / col("n").cast("double")))
      val msg = concat(lit(s"boot:$seed:"), col("__id"), lit(":"),
        col("rg").cast("string"))
      def weightOf(s: Int): Column = {
        val u = graft.functions.Md5Field.md5Field(msg, 8 * s, 8)
        (0 to 7).map(j =>
          when(shiftright(u, 4 * j + 1).bitwiseAND(lit(7L)) === 0, 1L)
            .otherwise(0L)).reduce(_ + _)
      }
      val perRg = base
        .select(col("__id"), col("x"),
          explode(sequence(lit(0), lit(replicates / 4 - 1))).as("rg"))
        .select(col("rg"), col("x"),
          weightOf(0).as("w0"), weightOf(1).as("w1"),
          weightOf(2).as("w2"), weightOf(3).as("w3"))
        .groupBy(col("rg"))
        .agg(sum(col("w0") * col("x")).as("swx0"), sum(col("w0")).as("sw0"),
          sum(col("w1") * col("x")).as("swx1"), sum(col("w1")).as("sw1"),
          sum(col("w2") * col("x")).as("swx2"), sum(col("w2")).as("sw2"),
          sum(col("w3") * col("x")).as("swx3"), sum(col("w3")).as("sw3"))
      val repMeans = perRg
        .select(explode(array((0 to 3).map(s =>
            struct((col("rg") * 4 + s).as("rep"),
              col(s"swx$s").as("swx"), col(s"sw$s").as("sw"))): _*)).as("r"))
        .select(col("r.rep").as("rep"), col("r.swx").as("swx"), col("r.sw").as("sw"))
        .withColumn("m",
          when(col("sw") > 0,
            col("swx").cast("double") / col("sw").cast("double")))
        .filter(col("m").isNotNull)
      val ranked = repMeans
        .withColumn("rn", row_number().over(Window.orderBy(col("m"), col("rep"))))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      val stats = ranked.agg(
        min(when(col("rn") * 1000 >= col("cnt") * loPermille, col("m"))).as("ci_lo"),
        min(when(col("rn") * 1000 >= col("cnt") * hiPermille, col("m"))).as("ci_hi"),
        max(col("cnt")).as("b_used"))
      full.crossJoin(broadcast(stats))
        .select(col("n"), col("sum_cents"), col("mean"), col("b_used"),
          col("ci_lo"), col("ci_hi"))
    }

    /** associationRules without the frequent-pair anchor. */
    def assocOld(): DataFrame = {
      val p = graft.analytics.Itemsets.frequentPairs(
        graft.queries.Graphs.baskets(spark, dir), "basket", "item", 2L)
      val fwd = p.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("support_ab"),
        col("support_a").as("support_ant"), col("lift"))
      val bwd = p.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("support_ab"),
        col("support_b").as("support_ant"), col("lift"))
      fwd.unionByName(bwd)
        .filter(col("support_ab") * 100 >= col("support_ant") * 10)
        .withColumn("confidence",
          col("support_ab").cast("double") / col("support_ant").cast("double"))
        .orderBy(desc("confidence"), col("antecedent"), col("consequent"))
    }

    /** BLEU without the tokenized-pair anchor. */
    def bleuOld(): DataFrame = {
      val docs = graft.Tables.documents(spark, dir)
      val near = docs.filter(col("doc_id") % 10 === 1)
        .select(col("doc_id").as("pair_id"),
          concat(lit("zqxnear "), col("text")).as("cand"), col("text").as("ref"))
      val copies = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000L).as("pair_id"),
          col("text").as("cand"), col("text").as("ref"))
      val pairs = near.unionByName(copies)
      val maxN = 4
      val tok = pairs.select(col("pair_id"),
        graft.dedup.Dedup.tokens(col("cand")).as("ct"),
        graft.dedup.Dedup.tokens(col("ref")).as("rt"))
      def grams(t: Column, n: Int): Column =
        when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => struct(lit(n).as("n"), array_join(slice(t, i, lit(n)), " ").as("gram"))))
          .otherwise(array().cast("array<struct<n:int,gram:string>>"))
      def sideCounts(t: Column, cntName: String): DataFrame =
        tok.select(col("pair_id"),
            explode(flatten(array((1 to maxN).map(n => grams(t, n)): _*))).as("ng"))
          .groupBy(col("pair_id"), col("ng.n").as("n"), col("ng.gram").as("gram"))
          .agg(count(lit(1)).as(cntName))
      val cand = sideCounts(col("ct"), "c_cand")
      val ref = sideCounts(col("rt"), "c_ref")
      val perN = cand
        .join(ref, Seq("pair_id", "n", "gram"), "left_outer")
        .select(col("n"), col("c_cand"),
          least(col("c_cand"), coalesce(col("c_ref"), lit(0L))).as("m"))
        .groupBy(col("n"))
        .agg(sum(col("m")).as("match_cnt"), sum(col("c_cand")).as("cand_cnt"))
        .withColumn("prec",
          when(col("cand_cnt") > 0,
            col("match_cnt").cast("double") / col("cand_cnt").cast("double")))
      val lens = tok.agg(
        sum(size(col("ct"))).as("cand_len"), sum(size(col("rt"))).as("ref_len"))
      perN.crossJoin(broadcast(lens)).orderBy(col("n"))
    }

    /** heapsCurve reshape candidate: single crossJoin of the two 1-row
      * aggregate frames + a metadata explode instead of a points-way union
      * re-referencing both aggregates per branch; `tok` persist dropped
      * (single consumer — `occ` is the persisted frame that matters).
      */
    def heapsNew(): DataFrame = {
      val points = 10
      val docs = graft.Tables.documents(spark, dir)
      // inline 8-partition kernel pin (what withKernelShufflePartitionsFor
      // derives for the KB-scale documents fixture), so the A/B isolates
      // the reshape, not the pin
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val tok = docs.select(col("doc_id").as("__id"),
          graft.dedup.Dedup.tokens(col("text")).as("t"))
        val occ = tok.select(col("__id"), explode(col("t")).as("term"))
          .filter(col("term") =!= "")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val firsts = occ.groupBy(col("term")).agg(min(col("__id")).as("__first"))
        val maxId = occ.agg(max(col("__id")).as("__mx"))
        def curve(src: DataFrame, idc: String, alias: String): DataFrame = {
          val aggs = (1 to points).map { i =>
            sum(when(col(idc) * points <= col("__mx") * i, 1L).otherwise(0L))
              .as(s"${alias}_$i")
          }
          src.crossJoin(broadcast(maxId)).agg(aggs.head, aggs.tail: _*)
        }
        val types = curve(firsts, "__first", "types")
        val tokens = curve(occ, "__id", "tokens")
        val one = types.crossJoin(broadcast(tokens))
        one.select(explode(array((1 to points).map(i =>
            struct(lit(i).as("checkpoint"),
              col(s"tokens_$i").as("n_tokens"),
              col(s"types_$i").as("n_types"))): _*)).as("r"))
          .select(col("r.checkpoint").as("checkpoint"),
            col("r.n_tokens").as("n_tokens"), col("r.n_types").as("n_types"))
          .orderBy(col("checkpoint"))
          .localCheckpoint(true)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    /** fingerprintPairs with the pre-r17 df cut: a per-fp window count over
      * all (doc, fp) rows + filter, anchored after the cut — vs the landed
      * broadcast-LEFT-ANTI hot-set inversion (the registry arm).
      */
    def winnowOld(): DataFrame = {
      val docs = graft.queries.PipelineQueries.augmented(
        graft.Tables.documents(spark, dir))
      val maxDocFreq = 50
      val fps = graft.dedup.Winnowing.fingerprints(docs, k = 3, w = 4)
      val rare = fps
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("__df") <= maxDocFreq)
        .select(col("doc"), col("fp"))
        .localCheckpoint(true)
      rare.as("a").join(rare.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
    }

    /** negativeSample with ONE anchored distinct-pairs frame: the current
      * shape derives `positives` (an orders⋈lineitem join) twice — once
      * under distinct-users for candidate generation, once under
      * distinct-pairs for the anti-join; here users derive from the
      * anchored pair set.
      */
    def negNew(): DataFrame = {
      val positives = graft.Tables.orders(spark, dir)
        .join(graft.Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("user_id"), col("l_partkey").as("item"))
      val catalog = graft.Tables.part(spark, dir).select(col("p_partkey"))
      val k = 3; val probes = 12; val seed = "neg"
      val pos = positives.distinct().localCheckpoint(true)
      val stats = catalog.agg(
        count(lit(1)).as("__n_items"), min(col("p_partkey")).as("__min_item"))
      val cand = pos.select(col("user_id")).distinct()
        .crossJoin(broadcast(stats))
        .withColumn("probe_idx", explode(sequence(lit(0), lit(probes - 1))))
        .withColumn("__u32",
          graft.functions.Md5Field.md5U32(concat(lit(seed), lit(":"),
            col("user_id").cast("string"), lit(":"),
            col("probe_idx").cast("string"))))
        .withColumn("neg_item",
          col("__min_item") + pmod(col("__u32"), col("__n_items")))
      val firstProbe = Window.partitionBy(col("user_id"), col("neg_item"))
        .orderBy(col("probe_idx"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("probe_idx"))
      cand
        .withColumn("__dup", row_number().over(firstProbe))
        .filter(col("__dup") === 1)
        .join(pos.select(col("user_id"), col("item").as("neg_item")),
          Seq("user_id", "neg_item"), "left_anti")
        .withColumn("__rk", row_number().over(byUser))
        .filter(col("__rk") <= k)
        .select(col("user_id"), col("neg_item"), col("probe_idx"))
        .orderBy(col("user_id"), col("probe_idx"))
    }

    /** fingerprintPairs with the fingerprint pipeline fused into array HOFs
      * (no (doc, pos) explode, no window shuffle, no global distinct —
      * array_distinct per doc): grams materialized on the ARRAY frame
      * (rule-1: persist the array frame so the winnow-min lambda does not
      * re-inline the md5 HOF per element), winnow-min as a second transform
      * over slices. Same df cut + self-join as the landed shape.
      */
    def winnowHof(): DataFrame = {
      val k = 3; val w = 4; val maxDocFreq = 50
      val docs = graft.queries.PipelineQueries.augmented(
        graft.Tables.documents(spark, dir))
      val toks = docs
        .select(col("doc_id").as("doc"), graft.dedup.Dedup.tokens(col("text")).as("__t"))
        .select(col("doc"), expr("filter(__t, x -> x <> '')").as("__t"))
      def md5U60(c: Column): Column = graft.functions.Md5Field.md5Field(c, 0, 15)
      val t = col("__t")
      val gramsCol = when(size(t) >= k,
        transform(sequence(lit(0), size(t) - k),
          i => md5U60(concat_ws(" ", slice(t, i + 1, lit(k))))))
        .otherwise(array().cast("array<bigint>"))
      val gramsDf = toks.select(col("doc"), gramsCol.as("__g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val g = col("__g")
      val winsCol = when(size(g) >= w,
        array_distinct(transform(sequence(lit(0), size(g) - w),
          j => array_min(slice(g, j + 1, lit(w))))))
        .otherwise(array().cast("array<bigint>"))
      val fps = gramsDf.select(col("doc"), explode(winsCol).as("fp"))
        .localCheckpoint(true)
      gramsDf.unpersist()
      val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDocFreq)
        .select(col("fp"))
      val rare = fps.join(broadcast(hot), Seq("fp"), "left_anti")
        .select(col("doc"), col("fp"))
      rare.as("a").join(rare.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
    }

    /** hitsQ with the pre-r17 LAZY MEMORY_AND_DISK persist on the distinct
      * edge table (vs the landed eager localCheckpoint anchor — three
      * consumers: a1, the h1 join, the a2 join). Same hybrid wide-build +
      * kernel-pin shape as the registry query.
      */
    def hitsOld(): DataFrame = {
      val e = graft.Tables.orders(spark, dir)
        .join(graft.Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
        .localCheckpoint(true)
      // inline 8-partition kernel pin (what withKernelShufflePartitionsFor
      // derives for the sf0.1 orders+lineitem frontier), so the A/B
      // isolates the persist-vs-anchor swap, not the pin
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val ed = e.select(col("src"), col("dst")).distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val a1 = ed.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
        val h1 = ed.join(a1, Seq("dst"))
          .groupBy(col("src")).agg(sum(col("a1")).as("h1"))
        val a2 = ed.join(h1, Seq("src"))
          .groupBy(col("dst")).agg(sum(col("h1")).as("a2"))
        a1.join(a2, Seq("dst"), "left_outer")
          .select(col("dst").as("node"), col("a1").as("authority1"),
            coalesce(col("a2"), lit(0L)).as("authority2"))
          .orderBy(col("authority2").desc, col("node")).limit(10)
          .localCheckpoint(true)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val exps: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("assoc", () => assocOld(), () => graft.SparkEntry.queries("q_assoc_rules")(spark, dir)),
      ("bleu", () => bleuOld(), () => graft.SparkEntry.queries("q_bleu")(spark, dir)),
      ("heaps", () => graft.SparkEntry.queries("q_heaps_law")(spark, dir), () => heapsNew()),
      ("boot", () => bootOld(), () => graft.SparkEntry.queries("q_bootstrap_ci")(spark, dir)),
      ("winnow", () => winnowOld(), () => graft.SparkEntry.queries("q_winnowing")(spark, dir)),
      ("neg", () => graft.SparkEntry.queries("q_negative_sample")(spark, dir), () => negNew()),
      ("winnowhof", () => graft.SparkEntry.queries("q_winnowing")(spark, dir), () => winnowHof()),
      ("hits", () => hitsOld(), () => graft.SparkEntry.queries("q_hits")(spark, dir)))

    exps.filter(e => which == "all" || which == e._1)
      .foreach { case (n, a, b) => runExp(n, a, b) }
    spark.stop()
  }
}
