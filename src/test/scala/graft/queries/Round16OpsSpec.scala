package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 operator contracts: the image-modality e2e pipeline
  * (`q_pipeline_media_e2e`) — fate totality/disjointness, brute-force
  * fate replay, and the word-for-word accepted-only index-update proof
  * the runtime's (count, xor, sum) signature stands in for.
  */
class Round16OpsSpec extends SparkSpec {

  private lazy val out =
    graft.SparkEntry.queries("q_pipeline_media_e2e")(spark, sf())
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap

  /** Fresh hashes of ALL batch members (originals + clones), independent
    * of the memoized fixtures — clone hash = original image's hash.
    */
  private def batchHashes: Array[(Long, Long, Long)] = {
    val media = graft.Tables.cachedParquet(spark,
      PipelineQueries.pngMediaParquet(spark, sf()))
    val b0 = media.filter(col("doc_id") % 7 === 0)
    val b = b0.unionByName(b0.filter(col("doc_id") % 91 === 0)
      .select((col("doc_id") + 6000000L).as("doc_id"), col("media"),
        col("format"), col("width"), col("height")))
      .filter(col("width") >= 10 && col("height") >= 8)
    graft.multimodal.Multimodal.imageDHash(spark, b).toDF()
      .filter(col("decoded"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def v1Hashes: Array[(Long, Long, Long)] =
    graft.Tables.cachedParquet(spark,
        PipelineQueries.phashHashesParquet(spark, sf()))
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 53 === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("one fate per batch image, proof bit TRUE everywhere") {
    val media = graft.Tables.cachedParquet(spark,
      PipelineQueries.pngMediaParquet(spark, sf()))
    val nBatch = media.filter(col("doc_id") % 7 === 0).count() +
      media.filter(col("doc_id") % 7 === 0 && col("doc_id") % 91 === 0).count()
    assert(out.size == nBatch, s"got ${out.size} fates for $nBatch batch images")
    assert(out.values.forall(_._2), "inc_equals_rebuild must be TRUE on every row")
  }

  test("fates ≡ brute-force stage replay (gate → v1 Hamming → batch Hamming → luma)") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val v1 = v1Hashes
    val bh = batchHashes.sortBy(_._1)
    val hamV1 = bh.flatMap { case (id, hi, lo) =>
      val hams = v1.map(v => ham((hi, lo), (v._2, v._3)))
      if (hams.nonEmpty && hams.min <= 3) Some(id -> hams.min) else None
    }.toMap
    val rem = bh.filterNot(h => hamV1.contains(h._1))
    val dupBatch = rem.filter { case (id, hi, lo) =>
      rem.exists(o => o._1 < id && ham((hi, lo), (o._2, o._3)) <= 3)
    }.map(_._1).toSet
    // luma: exact integer gradient sum over the ORIGINAL image id
    def luma(id: Long): Double = {
      val imgId = if (id >= 6000000L) id - 6000000L else id
      val w = (imgId % 16 + 1).toInt; val h = (imgId % 12 + 1).toInt
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += (imgId + 7L * x + 13L * y) % 256
      (3.0 * s) / (3.0 * w * h)
    }
    out.foreach { case (id, (fate, _)) =>
      val imgId = if (id >= 6000000L) id - 6000000L else id
      val w = imgId % 16 + 1; val h = imgId % 12 + 1
      val want =
        if (w < 10 || h < 8) "low_res"
        else if (hamV1.get(id).contains(0)) "dup_v1_exact"
        else if (hamV1.contains(id)) "dup_v1_near"
        else if (dupBatch.contains(id)) "dup_batch"
        else if (luma(id) < 96.0) "dark"
        else "accepted"
      assert(fate == want, s"doc $id: fate $fate want $want")
    }
    // at sf >= 0.01 the fixture must keep the core gates live
    Seq("low_res", "dup_v1_exact", "dup_v1_near").foreach { f =>
      assert(out.values.exists(_._1 == f), s"fixture exercises no '$f'")
    }
  }

  test("bucketed TB-delta LSH dedup ≡ broadcast variant; standing tables join without Exchange") {
    import graft.dedup.{Dedup, MinHashLSH}
    val docs = graft.Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val sh = Dedup.withStringShingles(docs, 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseSh = sh.filter(col("id") % 7 =!= 0)
    val deltaSh = sh.filter(col("id") % 7 === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseBands = MinHashLSH.replayableBandRows(
      MinHashLSH.md5Signatures(baseSh, 16), 8)
    Seq("r16_idx", "r16_arr", "r16_idx_plain", "r16_arr_plain").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    baseBands.write.bucketBy(8, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable("r16_idx")
    baseSh.write.bucketBy(8, "id").sortBy("id").saveAsTable("r16_arr")
    baseBands.write.saveAsTable("r16_idx_plain")
    baseSh.write.saveAsTable("r16_arr_plain")
    try {
      val expected = Dedup.dedupDeltaAgainstCorpusLsh(
        baseSh, baseBands, deltaSh, threshold = 0.5).collect().sortBy(_.getLong(0))
      val got = Dedup.dedupDeltaAgainstCorpusLshBucketed(
        "r16_arr", "r16_idx", deltaSh, threshold = 0.5).collect().sortBy(_.getLong(0))
      assert(got.sameElements(expected),
        s"bucketed variant diverges: got ${got.take(3).mkString(",")}")
      assert(got.exists(!_.getBoolean(2)), "fixture plants no drops")
      // plan shape: with broadcasts disabled, the bucketed standing tables
      // must save ≥ 2 Exchanges (index probe + array verification) vs the
      // same function over identical non-bucketed tables
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def exchanges(t1: String, t2: String) =
          Dedup.dedupDeltaAgainstCorpusLshBucketed(t1, t2, deltaSh, 0.5)
            .queryExecution.executedPlan.toString
            .linesIterator.count(_.contains("Exchange hashpartitioning"))
        val nBucketed = exchanges("r16_arr", "r16_idx")
        val nPlain = exchanges("r16_arr_plain", "r16_idx_plain")
        assert(nBucketed <= nPlain - 2,
          s"bucketing saved too few Exchanges: bucketed=$nBucketed plain=$nPlain")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      Seq("r16_idx", "r16_arr", "r16_idx_plain", "r16_arr_plain").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      sh.unpersist(); deltaSh.unpersist()
    }
  }

  test("accepted-only maintained index ≡ from-scratch rebuild, word for word") {
    import graft.multimodal.Multimodal
    val acceptedIds = out.collect {
      case (id, ("accepted", _)) => id
    }.toSeq
    val media = graft.Tables.cachedParquet(spark,
      PipelineQueries.pngMediaParquet(spark, sf()))
    val b0 = media.filter(col("doc_id") % 7 === 0)
    val batchAll = b0.unionByName(b0.filter(col("doc_id") % 91 === 0)
      .select((col("doc_id") + 6000000L).as("doc_id"), col("media"),
        col("format"), col("width"), col("height")))
    val accHashes = Multimodal.imageDHash(spark,
        batchAll.filter(col("doc_id").isin(acceptedIds: _*))).toDF()
      .filter(col("decoded"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
    val v1B = graft.Tables.cachedParquet(spark,
      PipelineQueries.phashV1SparseBandsParquet(spark, sf()))
    val maintained = v1B.unionByName(Multimodal.phashBands(accHashes))
    val v1H = graft.Tables.cachedParquet(spark,
        PipelineQueries.phashHashesParquet(spark, sf()))
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 53 === 1)
    val rebuilt = Multimodal.phashBands(v1H.unionByName(accHashes))
    assert(maintained.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(maintained).isEmpty,
      "maintained band index differs from the from-scratch rebuild")
  }
}
