package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the hot dedup operators: build a corpus N× the base sf
  * and measure whether time / shuffle bytes / output rows grow near-linearly
  * (i.e. the hot-shingle frequency cut keeps the candidate join bounded).
  *
  * Corpus construction — vocab-partitioned replicas: replica `r` of the
  * base corpus gets `~r` appended to EVERY token and ids shifted by
  * r·10M. Within a replica the token/shingle/duplicate structure of the
  * base corpus (including planted near-dups) is preserved EXACTLY; across
  * replicas the vocabularies are disjoint, so inter-replica shingle
  * collisions are zero by construction. The N× output must therefore be
  * EXACTLY N× the 1× output's rows — measured, so the probe doubles as a
  * correctness check at scale, and any super-linear row growth would
  * expose accidental cross-replica collisions rather than hide them.
  *
  * Usage: runMain graft.tools.ScaleProbe [baseSfDir] [workDir] [replicas]
  * Prints one table row per (operator, corpus) with min-of-3 time, shuffle
  * write/read bytes of the timed pass, and output rows. Operators marked
  * `deep` additionally run at 3×replicas (default 30×) — the round-9 probe
  * tier for the newest corpus workhorses (prefix filter, TF-cosine, random
  * walks, batch interval join).
  */
object ScaleProbe {

  private class ShuffleListener extends SparkListener {
    val write = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { write.set(0L); read.set(0L) }
  }

  /** Base corpus + planted near-dups (1-in-10 docs copied, first token
    * dropped, id +5M) — so the pair joins have real work at every scale.
    */
  private def planted(docs: DataFrame): DataFrame =
    docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"),
        col("lang"), col("source"), col("n_chars")))

  /** ER key frame for the edit-distance probes: replica-banded keys with a
    * FIXED-WIDTH "rr|" header (a variable-width header would leave fewer
    * discriminating text chars inside the block prefix for 2-digit
    * replicas, coarsening their blocks and breaking the N× invariant),
    * plus char-11 twins (id +3M stays inside the replica band and clear of
    * the +5M planted offset).
    *
    * The `~r` vocab markers are STRIPPED from the key text: suffix length
    * varies by replica digit count, so raw-text windows would carry
    * different content density per replica class (measured ×44/30 pair
    * rows). With the header banding blocks and the stripped text making
    * every replica's key set byte-identical to replica 0's (shared
    * prefixes are Levenshtein-neutral), the pair set must replay EXACTLY
    * N× — the invariant the probe asserts.
    */
  private def erKeys(d: DataFrame): DataFrame = {
    val keys = d.select(col("doc_id"),
      concat(lpad(expr("CAST(doc_id div 10000000 AS STRING)"), 2, "0"),
        lit("|"),
        substring(regexp_replace(col("text"), "~\\d+", ""), 1, 18)).as("k0"))
    keys.unionByName(keys.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(substring(col("k0"), 1, 10), lit("X"),
          substring(col("k0"), 12, 11)).as("k0")))
  }

  private def replicate(docs: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { r =>
      docs.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1~$r").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val replicas = if (args.length > 2) args(2).toInt else 10
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
      // same rationale as Bench: cycling many distinct plans between one
      // operator's samples must not evict its generated classes
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // bucketed standing tables (the r16 TB-delta probe) live in the
      // probe's work dir, never the repo cwd
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val base = planted(spark.read.parquet(s"$baseDir/documents.parquet"))
    val deepReplicas = replicas * 3
    // fixture dirs are keyed by the base corpus so a probe against a
    // different sf never reuses stale replicas; delete workDir by hand
    // after changing planted()/replicate() themselves
    val corpusRoot = s"$workDir/${new java.io.File(baseDir).getName}"
    Seq(1, replicas, deepReplicas).foreach { n =>
      val p = s"$corpusRoot/x$n"
      if (new java.io.File(p).exists())
        System.err.println(s"[scale] reusing existing corpus at $p")
      else replicate(base, n).write.mode("overwrite").parquet(p)
      // standing artifacts for the LSH cross-snapshot probe (untimed
      // inputs per BASELINE.md §Amortization: the shingled corpus and the
      // maintained band index are what a production pipeline holds before
      // the delta arrives; the probe times ONLY the dedup decision)
      val lp = s"$corpusRoot/x${n}_lshfix"
      if (!new java.io.File(lp).exists()) {
        val docs = spark.read.parquet(p)
        graft.dedup.Dedup.withStringShingles(docs, 5)
          .write.mode("overwrite").parquet(s"$lp/shingles")
        val baseSh = spark.read.parquet(s"$lp/shingles")
          .filter(!(col("id") < 10000000L && col("id") % 7 === 0))
        graft.dedup.MinHashLSH.replayableBandRows(
            graft.dedup.MinHashLSH.md5Signatures(baseSh, 16), 8)
          .write.mode("overwrite").parquet(s"$lp/bands")
      }
      // r14 bloom probe: the corpus fingerprint store per tier (standing
      // artifact; the bitmap itself is memoized per tier at first probe)
      val bfp = s"$corpusRoot/x${n}_bloomfix"
      if (!new java.io.File(bfp).exists())
        spark.read.parquet(p).select(md5(col("text")).as("fp"))
          .write.mode("overwrite").parquet(bfp)
      // r15 phash probe: the gated dHash table per tier (standing artifact
      // — image hashing amortizes like text fingerprinting; real PNG
      // encode + decode per doc) plus the v1 band index the incremental
      // operator maintains
      val pfp = s"$corpusRoot/x${n}_phashfix"
      if (!new java.io.File(pfp).exists()) {
        val docs = spark.read.parquet(p)
          .filter(col("doc_id") % 16 + 1 >= 10 && col("doc_id") % 12 + 1 >= 8)
        graft.multimodal.Multimodal.imageDHash(spark,
            graft.multimodal.Multimodal.pngMedia(spark, docs).toDF())
          .toDF().filter(col("decoded"))
          .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
          .write.mode("overwrite").parquet(s"$pfp/hashes")
        graft.multimodal.Multimodal.phashBands(
            spark.read.parquet(s"$pfp/hashes")
              .filter(!(col("doc_id") < 10000000L && col("doc_id") % 7 === 0)))
          .write.mode("overwrite").parquet(s"$pfp/v1bands")
      }
      // r17 media-composed probe fixture: the per-tier SPARSE standing
      // index slice (%53 == 1 of the gated non-batch hashes — the bench
      // query's fixture discipline: the closed-formula hash space
      // saturates, so the FULL index would kill every batch image at the
      // v1 stage and idle stages 4-6)
      locally {
        val pv1s = s"$pfp/v1sparse"
        if (!new java.io.File(pv1s).exists())
          graft.multimodal.Multimodal.phashBands(
              spark.read.parquet(s"$pfp/hashes")
                .filter(!(col("doc_id") < 10000000L && col("doc_id") % 7 === 0) &&
                  col("doc_id") % 53 === 1))
            .write.mode("overwrite").parquet(pv1s)
      }
      // r16 e2e composition probe fixtures: the FIXED incoming batch (built
      // from replica 0 only, so identical at every tier — ids parked at
      // +900M, clear of every replica band and the +5M planted offset):
      // verbatim copies of a %13 slice (ingest dups, die at stage 0),
      // token-suffixed novels of another slice (vocab-disjoint from the
      // corpus — pass the gate, flow to quality/budget), and exact copies
      // of the novels (batch-internal dups, die at stage 1). Then the
      // per-tier standing artifacts the composed pipeline holds before the
      // batch arrives (BASELINE.md §Amortization): the merged corpus∪batch
      // parquet, its near-dup pair table, its positional shingles, and the
      // batch fp store.
      val e2eBatchPath = s"$corpusRoot/e2e_batch"
      if (!new java.io.File(e2eBatchPath).exists()) {
        val d0 = spark.read.parquet(s"$corpusRoot/x1")
          .select(col("doc_id"), col("text"))
        val ing = d0.filter(col("doc_id") % 13 === 1)
          .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        val nov = d0.filter(col("doc_id") % 13 === 2)
          .select((col("doc_id") + 910000000L).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", "$1~b").as("text"))
        val novDup = nov.select((col("doc_id") + 10000000L).as("doc_id"),
          col("text"))
        ing.unionByName(nov).unionByName(novDup)
          .write.mode("overwrite").parquet(e2eBatchPath)
        spark.read.parquet(e2eBatchPath)
          .select(col("doc_id"), md5(col("text")).as("fp"))
          .write.mode("overwrite").parquet(s"$corpusRoot/e2e_batch_fp")
      }
      // r16 bucketed TB-delta standing tables: the lshfix band index and
      // corpus shingle arrays as CATALOG TABLES bucketed on (band, bucket)
      // / id — rebuilt per run (the in-memory catalog does not persist, so
      // a PRIOR run's warehouse location must be cleared by hand first:
      // mode("overwrite") can't drop a location the fresh catalog has no
      // table for — LOCATION_ALREADY_EXISTS otherwise)
      def clearTableLocation(table: String): Unit = {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        val loc = new java.io.File(s"$workDir/warehouse/$table")
        if (loc.exists()) rm(loc)
      }
      locally {
        val lp2 = s"$corpusRoot/x${n}_lshfix"
        val isDeltaId = col("id") < 10000000L && col("id") % 7 === 0
        clearTableLocation(s"r16b_idx_x$n")
        spark.read.parquet(s"$lp2/bands")
          .write.bucketBy(8, "band", "bucket")
          .sortBy("band", "bucket").saveAsTable(s"r16b_idx_x$n")
        clearTableLocation(s"r16b_arr_x$n")
        spark.read.parquet(s"$lp2/shingles").filter(!isDeltaId)
          .write.bucketBy(8, "id")
          .sortBy("id").saveAsTable(s"r16b_arr_x$n")
      }
      // r17 bucketed TB-delta standing tables: the phashfix v1 band index
      // bucketed on (bi, bv) — 32 buckets, NOT the LSH family's 8: bucket
      // count is the co-located join's parallelism and the saturated band
      // space concentrates collision work (see the operator's SKEW note);
      // repartition-aligned write keeps one file per bucket — plus the
      // SALTED layout (bi, bv, salt) that spreads the hot degenerate band
      // values, and the bloomfix corpus fp store bucketed on fp. Rebuilt
      // per run like the r16b tables (in-memory catalog).
      locally {
        val v1b = spark.read.parquet(s"$pfp/v1bands")
        clearTableLocation(s"r17b_ph_x$n")
        v1b.repartition(32, col("bi"), col("bv"))
          .write.bucketBy(32, "bi", "bv")
          .sortBy("bi", "bv").saveAsTable(s"r17b_ph_x$n")
        clearTableLocation(s"r17b_phs_x$n")
        graft.multimodal.Multimodal.phashBandsSalted(
            spark.read.parquet(s"$pfp/hashes")
              .filter(!(col("doc_id") < 10000000L && col("doc_id") % 7 === 0)),
            numSalts = 16)
          .repartition(32, col("bi"), col("bv"), col("salt"))
          .write.bucketBy(32, "bi", "bv", "salt")
          .sortBy("bi", "bv", "salt").saveAsTable(s"r17b_phs_x$n")
        clearTableLocation(s"r17b_fp_x$n")
        spark.read.parquet(bfp)
          .write.bucketBy(8, "fp")
          .sortBy("fp").saveAsTable(s"r17b_fp_x$n")
      }
      val efp = s"$corpusRoot/x${n}_e2efix"
      if (!new java.io.File(efp).exists()) {
        val corpusAll = spark.read.parquet(p).select(col("doc_id"), col("text"))
          .unionByName(spark.read.parquet(e2eBatchPath))
        corpusAll.write.mode("overwrite").parquet(s"$efp/corpus")
        val onDisk = spark.read.parquet(s"$efp/corpus")
        graft.dedup.Dedup.ngramJaccardPairs(onDisk, k = 5, threshold = 0.5)
          .select("id_a", "id_b")
          .write.mode("overwrite").parquet(s"$efp/pairs")
        graft.dedup.Dedup.positionalArrays(onDisk, 5)
          .write.mode("overwrite").parquet(s"$efp/pos")
      }
    }
    // the FIXED incoming batch for the bloom probe: exact copies (+1M) and
    // prefixed variants (+2M) of replica-0 slices — identical at every
    // corpus tier, so verdict rows must stay EXACTLY flat. The single slice
    // definition is PipelineQueries.augDeltaSlice (ADVICE r14: this was a
    // third hand-coded near-copy with a drifted prefix).
    val bloomDeltaPath = s"$corpusRoot/bloom_delta_fp"
    if (!new java.io.File(bloomDeltaPath).exists()) {
      val d0 = spark.read.parquet(s"$corpusRoot/x1")
        .select(col("doc_id"), col("text"))
      graft.queries.PipelineQueries.augDeltaSlice(d0)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .write.mode("overwrite").parquet(bloomDeltaPath)
    }
    val bloomWords =
      new scala.collection.concurrent.TrieMap[String, Array[Long]]()

    // the FIXED incoming image batch for the media-composed probe:
    // replica 0's %7 docs — ALL dims, so the metadata gate stays live —
    // through the REAL PNG encoder, plus pixel-identical +900M clones of
    // the %91 slice (batch-internal dups; clones COPY the blob, so their
    // hash equals the original's). Identical at every corpus tier.
    val mediaBatchPath = s"$corpusRoot/e2e_media_batch"
    if (!new java.io.File(mediaBatchPath).exists()) {
      val d0 = spark.read.parquet(s"$corpusRoot/x1")
        .filter(col("doc_id") % 7 === 0).select("doc_id")
      val m0 = graft.multimodal.Multimodal.pngMedia(spark, d0).toDF()
      m0.unionByName(m0.filter(col("doc_id") % 91 === 0)
          .select((col("doc_id") + 900000000L).as("doc_id"), col("media"),
            col("format"), col("width"), col("height")))
        .write.mode("overwrite").parquet(mediaBatchPath)
    }

    // star-and-ring community edges derived from doc ids; the formula is
    // invariant under the replica offset (10M ≡ 0 mod 100), so replicas
    // carry disjoint copies of the same communities
    def communityEdges(d: DataFrame): DataFrame = {
      val ids = d.select(col("doc_id"))
      val star = ids.filter(col("doc_id") % 10 =!= 0)
        .select((col("doc_id") - col("doc_id") % 10).as("id_a"),
          col("doc_id").as("id_b"))
      val ring = ids.filter(col("doc_id") % 10 === 0 && col("doc_id") % 100 < 90)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 10).as("id_b"))
        .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      star.unionByName(ring)
    }

    // (name, runsAtDeepTier, expectedRowGrowth, op) — expectation for the
    // summary line: "N" = rows must be EXACTLY N× (disjoint-vocab replica
    // invariant), "~N" = near-linear (the operator's per-replica structure
    // depends on the replica's hashed vocabulary — CDC boundary density),
    // "flat" = rows must NOT grow (bounded summary — the broadcastability
    // claim itself)
    val ops: Seq[(String, Boolean, String, DataFrame => DataFrame)] = Seq(
      ("ngramJaccardPairs", false, "N", d =>
        graft.dedup.Dedup.ngramJaccardPairs(d, k = 5, threshold = 0.5)),
      ("sharedTokenRuns", false, "N", d =>
        graft.dedup.Dedup.sharedTokenRuns(d, k = 5, minRunTokens = 10)),
      // r13 bipartite run decontamination: the per-replica bench split is
      // replica-invariant (mod 10M first), vocab disjointness kills cross-
      // replica matches, and the corpus-df cut is within-replica — so
      // flagged rows must replay exactly Nx while the benchmark side stays
      // a broadcast at every tier
      ("benchTokenRuns", true, "N", { d =>
        val bench = d.filter(col("doc_id") % 10000000L % 97 === 3)
        val corpus = d.filter(col("doc_id") % 10000000L % 97 =!= 3)
        graft.dedup.Dedup.benchmarkTokenRuns(corpus, bench,
          k = 5, minRunTokens = 15)
      }),
      // r13 cross-snapshot dedup decision: base/delta split replica-
      // invariant; the planted +5M near-dups land on deterministic sides
      // of the split, so keep/drop rows replay exactly Nx and the delta-
      // side probe join must stay O(delta + collisions)
      ("dedupCrossSnapshot", true, "N", { d =>
        val base = d.filter(col("doc_id") % 10000000L % 7 =!= 0)
        val delta = d.filter(col("doc_id") % 10000000L % 7 === 0)
        // the operator's documented caller-persist contract (r14): its
        // multi-branch plan re-traverses both inputs, so an UNPERSISTED
        // withShingles frame re-inlines the shingle HOF per explode
        // reference (NOTES rule 1 — measured 49 s vs 2 s at x1 here)
        graft.dedup.Dedup.dedupDeltaAgainstCorpus(
          graft.dedup.Dedup.withShingles(base, 5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          graft.dedup.Dedup.withShingles(delta, 5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          threshold = 0.5)
      }),
      // r14 LSH cross-snapshot dedup: a FIXED delta (replica 0's %7 slice)
      // probed against a GROWING corpus whose string shingles and band
      // index are prebuilt standing artifacts (the x${n}_lshfix dirs) —
      // the claim under test is shuffle ∝ delta + collisions, NOT corpus:
      // replica vocabularies are disjoint so extra corpus replicas add
      // candidates never, and output rows stay EXACTLY flat at |delta|
      ("dedupCrossSnapshotLsh", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val lp = s"$corpusRoot/${xdir}_lshfix"
        val sp = d.sparkSession
        val sh = sp.read.parquet(s"$lp/shingles")
        val isDelta = col("id") < 10000000L && col("id") % 7 === 0
        graft.dedup.Dedup.dedupDeltaAgainstCorpusLsh(
          sh.filter(!isDelta), sp.read.parquet(s"$lp/bands"),
          sh.filter(isDelta), threshold = 0.5)
      }),
      // r16 bucketed TB-delta LSH dedup: the SAME fixed delta and standing
      // index as dedupCrossSnapshotLsh, but through the bucket-partitioned
      // co-located path (Dedup.dedupDeltaAgainstCorpusLshBucketed) — the
      // production shape when the delta is too large to broadcast. The
      // claim under test: verdict rows EXACTLY flat at |delta|, and the
      // per-query SHUFFLE stays delta-sized at every corpus tier (the
      // standing tables' bucketing absorbs the corpus side — its layout IS
      // the shuffle, paid once at snapshot write); the corpus contributes
      // scan only. Directly comparable, tier for tier, with the broadcast
      // path's row above.
      ("dedupXSnapLshBucketed", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val sh = sp.read.parquet(s"$corpusRoot/${xdir}_lshfix/shingles")
        val isDelta = col("id") < 10000000L && col("id") % 7 === 0
        graft.dedup.Dedup.dedupDeltaAgainstCorpusLshBucketed(
          s"r16b_arr_$xdir", s"r16b_idx_$xdir",
          sh.filter(isDelta), threshold = 0.5)
      }),
      // r14 bloom delta dedup: a FIXED batch probed against a GROWING
      // corpus — the bitmap is constant-size (m sized to the x30 corpus:
      // 2^22 bits = 512 KB, load 0.17, fp ~6e-4), the probe is map-only,
      // and the exact confirm broadcasts the hit set and STREAMS the
      // corpus fp store. Verdict rows must stay EXACTLY flat; shuffle
      // must stay batch-sized (the corpus contributes scan, not shuffle)
      ("bloomProbeFixedDelta", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val corpusFp = sp.read.parquet(s"$corpusRoot/${xdir}_bloomfix")
        val words = bloomWords.getOrElseUpdate(xdir,
          graft.dedup.BloomDedup.corpusBloom(corpusFp, 1 << 22, 4))
        graft.dedup.BloomDedup.bloomProbe(words, corpusFp,
          sp.read.parquet(bloomDeltaPath), mBits = 1 << 22, k = 4)
      }),
      // r17 bucketed TB-delta bloom confirm: the SAME fixed batch and
      // standing bitmap as bloomProbeFixedDelta, but the exact confirm
      // shuffles the deduped hit-fp set INTO the fp store's bucketed
      // catalog table as a left-semi SMJ (nothing broadcast, zero
      // corpus-side Exchange — BloomDedup.bloomProbeBucketed). Claim under
      // test: verdict rows exactly flat at |batch|, shuffle batch-sized
      // and corpus-growth-FLAT (the store's bucketing absorbs the corpus
      // side; it contributes co-located scan only). Directly comparable,
      // tier for tier, with bloomProbeFixedDelta above.
      ("bloomProbeDeltaBkt", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val corpusFp = sp.read.parquet(s"$corpusRoot/${xdir}_bloomfix")
        val words = bloomWords.getOrElseUpdate(xdir,
          graft.dedup.BloomDedup.corpusBloom(corpusFp, 1 << 22, 4))
        graft.dedup.BloomDedup.bloomProbeBucketed(words, s"r17b_fp_$xdir",
          sp.read.parquet(bloomDeltaPath), mBits = 1 << 22, k = 4)
      }),
      // r15 incremental phash: a FIXED image batch (replica 0's %7 slice)
      // accepted into a GROWING maintained band index. Unlike the
      // disjoint-vocab text probes, the 64-bit perceptual hash space is
      // DENSE, so a bigger corpus legitimately yields more matches per
      // delta image — the flat invariant is the OUTPUT ROW COUNT (one per
      // delta image); time carries the honest O(corpus) rebuild-proof
      // scan (map-combined signature — no corpus shuffle)
      ("phashIncrementalFixedDelta", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val hashes = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/hashes")
        val v1b = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/v1bands")
        val isDelta = col("doc_id") < 10000000L && col("doc_id") % 7 === 0
        graft.multimodal.Multimodal.phashIncremental(
          v1b, hashes.filter(isDelta), hashes,
          isV1 = !(col("pid") < 10000000L && col("pid") % 7 === 0))
      }),
      // r17 bucketed TB-delta phash: the SAME fixed batch and standing v1
      // band index as phashIncrementalFixedDelta, but the corpus-branch
      // candidate probe shuffles the delta bands INTO the index's (bi, bv)
      // bucketed catalog table (no broadcast, zero index-side Exchange —
      // Multimodal.phashIncrementalBucketed). Output rows exactly flat
      // (one per delta image); per-query shuffle must stay delta-sized and
      // corpus-growth-flat; time still carries the honest O(corpus)
      // rebuild-proof SCAN (map-combined signature). Directly comparable,
      // tier for tier, with phashIncrementalFixedDelta above.
      ("phashIncDeltaBkt", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val hashes = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/hashes")
        val isDelta = col("doc_id") < 10000000L && col("doc_id") % 7 === 0
        graft.multimodal.Multimodal.phashIncrementalBucketed(
          s"r17b_ph_$xdir", hashes.filter(isDelta), hashes,
          isV1 = !(col("pid") < 10000000L && col("pid") % 7 === 0))
      }),
      // the SALTED layout under the same probe: the fixture's closed
      // formula saturates four degenerate band values with ~65% of the
      // index mass, the adversarial case for key-partitioned co-location
      // (a bucketed scan cannot be AQE-skew-split) — 16 salts spread it
      ("phashIncDeltaBktSalt", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        val hashes = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/hashes")
        val isDelta = col("doc_id") < 10000000L && col("doc_id") % 7 === 0
        graft.multimodal.Multimodal.phashIncrementalBucketed(
          s"r17b_phs_$xdir", hashes.filter(isDelta), hashes,
          isV1 = !(col("pid") < 10000000L && col("pid") % 7 === 0),
          numSalts = 16)
      }),
      // r16 e2e COMPOSITION probe (the six-stage pipeline as one unit —
      // the individually-probed kernels plus the inter-stage broadcasts
      // and eager id-list anchors pipelineE2eQ composes them with): a
      // FIXED batch (ingest dups + vocab-disjoint novels + batch-internal
      // copies, ids at +900M) arrives against a GROWING corpus whose
      // standing artifacts (merged corpus, pair table, positional
      // shingles, corpus bloom + fp store) are prebuilt per tier. Output =
      // the BATCH's fate rows — exactly flat at |batch| (every batch doc
      // gets exactly one fate by the union's stage disjointness). The
      // claim under test: total shuffle scales with the CORPUS ONCE
      // (stage 1's hash agg + the kernel stages), not once PER STAGE —
      // the id-list joins are broadcast, so stages 2-5 add no
      // corpus-sized reshuffle.
      ("pipelineE2eComposed", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        def pin[T](n: Int)(f: => T): T = {
          val prev = sp.conf.get("spark.sql.shuffle.partitions")
          sp.conf.set("spark.sql.shuffle.partitions", n.toString)
          try f finally sp.conf.set("spark.sql.shuffle.partitions", prev)
        }
        import org.apache.spark.sql.expressions.Window
        val efp = s"$corpusRoot/x${xdir.stripPrefix("x")}_e2efix"
        val all = sp.read.parquet(s"$efp/corpus")
        val corpusFp = sp.read.parquet(s"$corpusRoot/${xdir}_bloomfix")
        val batchFp = sp.read.parquet(s"$corpusRoot/e2e_batch_fp")
        val bits = bloomWords.getOrElseUpdate(xdir,
          graft.dedup.BloomDedup.corpusBloom(corpusFp, 1 << 22, 4))
        // stage 0: bloom front gate, map-only probe + broadcast confirm
        val drop0 = pin(8) {
          graft.dedup.BloomDedup.bloomProbe(bits, corpusFp, batchFp,
              mBits = 1 << 22, k = 4)
            .filter(col("verdict") === "drop").select("doc_id")
            .localCheckpoint(true)
        }
        val s0 = all.join(broadcast(drop0), Seq("doc_id"), "left_anti")
        // stage 1: exact dedup — the one corpus-sized aggregate
        val keep1 = s0.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
          .localCheckpoint(true)
        // stage 2: standing pair table restricted to surviving ends
        val drop2 = pin(8) {
          sp.read.parquet(s"$efp/pairs")
            .join(broadcast(keep1.select(col("doc_id").as("id_a"))),
              Seq("id_a"), "left_semi")
            .join(broadcast(keep1.select(col("doc_id").as("id_b"))),
              Seq("id_b"), "left_semi")
            .select(col("id_b").as("doc_id")).distinct()
            .localCheckpoint(true)
        }
        val keep2 = keep1.join(broadcast(drop2), Seq("doc_id"), "left_anti")
        // stage 3: decontamination vs the (replica-invariant) eval slice
        val bench = all.filter(col("doc_id") < 900000000L &&
          col("doc_id") % 10000000L % 97 === 3)
        val drop3 = pin(8) {
          val pos2 = sp.read.parquet(s"$efp/pos")
            .join(broadcast(keep2.select(col("doc_id").as("id"))),
              Seq("id"), "left_semi")
          graft.dedup.Dedup.benchmarkTokenRunsFromPositional(pos2, bench,
              k = 5, minRunTokens = 15)
            .select("doc_id")
            .localCheckpoint(true)
        }
        val keep3 = keep2.join(broadcast(drop3), Seq("doc_id"), "left_anti")
        // stage 4: quality filter
        val q = graft.text.TextAnalysis.qualityFeatures(
            all.join(broadcast(keep3), Seq("doc_id"), "left_semi"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val low = q.filter(col("quality_score") < 0.5).select("doc_id")
        // stage 5: per-language greedy token budget
        val sel = pin(8) {
          val w = Window.partitionBy(col("pred_lang"))
            .orderBy(col("quality_score").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          q.filter(col("quality_score") >= 0.5)
            .withColumn("pred_lang", graft.text.TextAnalysis.langId(col("text")))
            .withColumn("__cum", sum(col("n_tokens")).over(w))
            .select(col("doc_id"),
              when(col("__cum") <= 20000L, "selected").otherwise("over_budget")
                .as("fate"))
            .localCheckpoint(true)
        }
        val fates = drop0.select(col("doc_id"), lit("ingest_dup").as("fate"))
          .unionByName(s0.select("doc_id")
            .join(broadcast(keep1), Seq("doc_id"), "left_anti")
            .select(col("doc_id"), lit("exact_dup").as("fate")))
          .unionByName(drop2.select(col("doc_id"), lit("near_dup").as("fate")))
          .unionByName(drop3.select(col("doc_id"), lit("contaminated").as("fate")))
          .unionByName(low.select(col("doc_id"), lit("low_quality").as("fate")))
          .unionByName(sel)
        fates.filter(col("doc_id") >= 900000000L)
      }),
      // r17 media e2e COMPOSITION probe (the six-stage IMAGE pipeline as
      // one unit — the media twin of pipelineE2eComposed): a FIXED image
      // batch (replica 0's %7 docs + pixel-identical clones, real PNGs)
      // arrives against a GROWING sparse standing band index. Output =
      // the batch's fate rows, exactly flat at |batch| (one fate per
      // image by stage disjointness). Claims under test: stage 0 gates on
      // METADATA only (the blob column is never read for rejects), ONE
      // real ImageIO decode pass of survivors (O(batch),
      // corpus-independent), the standing index STREAMS past broadcast
      // batch bands ONCE, and the rebuild-proof signature is the only
      // O(index) term (map-combined — no index shuffle). The fate MIX
      // legitimately shifts toward dup_v1 as the index grows (the dense
      // mod-768 hash space — the phashIncrementalFixedDelta adjudication);
      // the flat invariant is the row count.
      ("pipelineMediaE2eComposed", true, "flat", { d =>
        val xdir = new java.io.File(d.inputFiles.head).getParentFile.getName
        val sp = d.sparkSession
        def pin[T](n: Int)(f: => T): T = {
          val prev = sp.conf.get("spark.sql.shuffle.partitions")
          sp.conf.set("spark.sql.shuffle.partitions", n.toString)
          try f finally sp.conf.set("spark.sql.shuffle.partitions", prev)
        }
        import graft.multimodal.Multimodal
        val batch = sp.read.parquet(mediaBatchPath)
        val v1b = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/v1sparse")
        val v1h = sp.read.parquet(s"$corpusRoot/${xdir}_phashfix/hashes")
          .filter(!(col("doc_id") < 10000000L && col("doc_id") % 7 === 0) &&
            col("doc_id") % 53 === 1)
        pin(8) {
          def ham(p: String, q: String) =
            bit_count(col(s"$p.hash_hi").bitwiseXOR(col(s"$q.hash_hi"))) +
              bit_count(col(s"$p.hash_lo").bitwiseXOR(col(s"$q.hash_lo")))
          val lowRes = batch.select(col("doc_id"), col("width"), col("height"))
            .filter(col("width") < 10 || col("height") < 8)
            .select("doc_id").localCheckpoint(true)
          val surv0 = batch.join(broadcast(lowRes), Seq("doc_id"), "left_anti")
          val hashed = Multimodal.imageHashLuma(sp, surv0).toDF()
            .localCheckpoint(true)
          val decoded = hashed.filter(col("decoded"))
          val undec = hashed.filter(!col("decoded")).select("doc_id")
          val feats = decoded.select(col("doc_id"), col("luma_mean"))
          val bHash = decoded.select(col("doc_id"), col("hash_hi"),
            col("hash_lo"))
          val bBands = Multimodal.phashBands(bHash)
          val hamV1 = broadcast(bBands.as("a"))
            .join(v1b.as("b"),
              col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv"))
            .select(col("a.doc_id").as("doc_id"), ham("a", "b").as("ham"))
            .groupBy(col("doc_id")).agg(min(col("ham")).as("min_ham"))
            .filter(col("min_ham") <= 3)
            .localCheckpoint(true)
          val bRemain = bHash.join(broadcast(hamV1.select("doc_id")),
            Seq("doc_id"), "left_anti").localCheckpoint(true)
          val bandsRem = Multimodal.phashBands(bRemain)
          val dupBatch = bandsRem.as("a").join(bandsRem.as("b"),
              col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
                col("b.doc_id") < col("a.doc_id"))
            .select(col("a.doc_id").as("doc_id"), ham("a", "b").as("ham"))
            .filter(col("ham") <= 3)
            .select("doc_id").distinct().localCheckpoint(true)
          val remain2 = bRemain.select("doc_id")
            .join(broadcast(dupBatch), Seq("doc_id"), "left_anti")
          val dark = remain2.join(feats, Seq("doc_id"))
            .filter(col("luma_mean") < 96.0)
            .select("doc_id").localCheckpoint(true)
          val accepted = remain2.join(broadcast(dark), Seq("doc_id"), "left_anti")
            .localCheckpoint(true)
          val accHashes = bHash.join(broadcast(accepted), Seq("doc_id"),
            "left_semi")
          val maintained = v1b.unionByName(Multimodal.phashBands(accHashes))
          val rebuilt = Multimodal.phashBands(v1h.unionByName(accHashes))
          def sig(df: org.apache.spark.sql.DataFrame) = {
            val h = xxhash64(col("doc_id"), col("hash_hi"),
              col("hash_lo"), col("bi"), col("bv"))
            df.agg(count(lit(1)), call_function("bit_xor", h),
              sum(h.cast("decimal(38,0)"))).head()
          }
          val incEq = sig(maintained) == sig(rebuilt)
          lowRes.select(col("doc_id"), lit("low_res").as("fate"))
            .unionByName(hamV1.select(col("doc_id"),
              when(col("min_ham") === 0, "dup_v1_exact")
                .otherwise("dup_v1_near").as("fate")))
            .unionByName(undec.select(col("doc_id"),
              lit("undecodable").as("fate")))
            .unionByName(dupBatch.select(col("doc_id"),
              lit("dup_batch").as("fate")))
            .unionByName(dark.select(col("doc_id"), lit("dark").as("fate")))
            .unionByName(accepted.select(col("doc_id"),
              lit("accepted").as("fate")))
            .withColumn("inc_equals_rebuild", lit(incEq))
        }
      }),
      // verified pairs need Jaccard >= threshold, and cross-replica Jaccard
      // is identically 0 (disjoint vocab) -- so the Nx invariant holds for
      // the sketch path too, band-collision noise notwithstanding
      ("minhashLsh", false, "N", d =>
        graft.dedup.MinHashLSH.nearDuplicates(d, k = 5, numHashes = 64,
          bands = 16, threshold = 0.5)),
      // prefix filtering is LOSSLESS, so its Nx output must be exactly the
      // Nx exact-jaccard pair set — the linearity check simultaneously
      // validates the candidate bound and the result at scale
      ("prefixFilterJaccard", true, "N", d =>
        graft.dedup.Dedup.prefixFilterJaccardPairs(d, k = 5, threshold = 0.5)),
      // TF-cosine: the rare-shingle df cut bounds the candidate join; the
      // pair set is intra-replica only (disjoint vocab ⇒ cosine 0 across)
      ("tfCosinePairs", true, "N", d =>
        graft.dedup.Dedup.tfCosinePairs(d, k = 5, threshold = 0.5)),
      // deep tier since r12: with q_label_prop the bench's most expensive
      // operator, the x30 reading is the 100x-claim anchor
      ("labelPropagation", true, "N", d =>
        graft.dedup.DupClusters.labelPropagation(communityEdges(d), rounds = 2)),
      // personalized PageRank on the hub-cycle graph (q_ppr's exact shape;
      // the closing-edge and seed moduli are replica-offset-invariant:
      // 100 | 10M and the seed test keys on id mod 10M), seeded at block 0
      // OF EVERY replica so each replica replays replica 0's mass flow —
      // rows exactly Nx, per-round cost one degree join + one dest-keyed
      // sum, the message-passing linearity under test
      ("personalizedPpr", true, "N", { d =>
        val e = communityEdges(d)
        val closing = d.filter(col("doc_id") % 10 === 0 &&
            col("doc_id") % 100 === 90)
          .select((col("doc_id") - lit(90L)).as("id_a"),
            col("doc_id").as("id_b"))
        val seeds = d.filter(col("doc_id") % 10000000L < 100 &&
            col("doc_id") % 10 === 0)
          .select(col("doc_id").as("node_id"))
        graft.dedup.DupClusters.personalizedPageRank(
          e.unionByName(closing), seeds)
      }),
      // the q_minhash_incremental maintenance join: delta docs (an
      // offset-invariant 1-in-10 slice) sign+band against the incremental
      // index (base bands ∪ delta bands). Disjoint replica vocab keeps
      // band collisions replica-local, so probed pair rows are ~Nx (each
      // replica's ~r-suffixed vocab hashes fresh, so BAND-collision
      // density varies slightly per replica — measured x10.02/x30.10, the
      // winnowing selection-variance class) while the index union itself
      // is the Nx band table — the claim is that delta maintenance costs
      // O(delta + collisions), not a rebuild
      ("minhashIncrDelta", true, "~N", { d =>
        import graft.dedup.{Dedup, MinHashLSH}
        val base = Dedup.withShingles(
          d.filter(col("doc_id") % 10 =!= 3).select(col("doc_id"), col("text")), 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val delta = Dedup.withShingles(
          d.filter(col("doc_id") % 10 === 3).select(col("doc_id"), col("text")), 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b1 = MinHashLSH.bandTable(
          MinHashLSH.signaturesFromShingles(base, 64), 16)
        val bDelta = MinHashLSH.bandTable(
          MinHashLSH.signaturesFromShingles(delta, 64), 16)
        val bInc = b1.unionByName(bDelta)
        bDelta.as("d").join(bInc.as("all"),
            col("d.band") === col("all.band") &&
              col("d.bucket") === col("all.bucket") &&
              col("d.id") =!= col("all.id"))
          .select(least(col("d.id"), col("all.id")).as("id_a"),
            greatest(col("d.id"), col("all.id")).as("id_b"))
          .distinct()
      }),
      // random walks: one walk per node (rows out = #nodes exactly); the
      // r9 min_by step aggregate must keep the per-step candidate frame
      // O(Σ degree) with map-side partial collapse — linear time/shuffle
      ("randomWalks", true, "N", d =>
        graft.dedup.DupClusters.randomWalks(communityEdges(d), steps = 3)),
      // the hub valve: capped adjacency (top-4 of the ~9-degree star hubs)
      // — same linearity contract, lower constant
      ("randomWalksCapped", true, "N", d =>
        graft.dedup.DupClusters.randomWalks(communityEdges(d), steps = 3,
          maxDegree = Some(4))),
      // batch form of the stream-stream interval join (q_stream_join's
      // oracle shape): equi user key + event-time range. Users and minutes
      // derive from doc ids with moduli invariant under both the replica
      // (10M) and planted (+5M) offsets (100 | both, 4 | both), so each
      // replica contributes an identical, disjoint join structure
      ("intervalJoinBatch", true, "N", { d =>
        val views = d.select(
          (col("doc_id") - col("doc_id") % 100).as("v_user"),
          col("doc_id").as("view_id"),
          timestamp_micros(col("doc_id") % 100 * 60000000L).as("vt"))
        val purch = d.select(
          (col("doc_id") - col("doc_id") % 100).as("p_user"),
          col("doc_id").as("purchase_id"),
          timestamp_micros(col("doc_id") % 100 * 60000000L +
            (col("doc_id") % 4 + 1) * 30000000L).as("pt"))
        views.join(purch, col("v_user") === col("p_user") &&
          col("pt") >= col("vt") &&
          col("pt") < col("vt") + expr("INTERVAL 2 MINUTES"))
      }),
      // DSIR: the weight table stays bucket-bounded at ANY corpus size (its
      // row count is ≤ 256 at every scale — THE broadcastability claim this
      // probe exists to measure); output rows = #docs exactly, and the two
      // corpus-sized shuffles (bucket counts map-combined, per-doc score
      // agg) must grow linearly
      // winnowing: disjoint replica vocab makes the GRAM sets disjoint,
      // but the ~r suffix changes every gram HASH, so each replica's
      // window-min SELECTION density differs slightly — pair rows land
      // within ~0.2% of Nx rather than exactly (x9.99/x30.06, measured
      // IDENTICALLY under the 32-bit and the current 60-bit fingerprint
      // hash, ruling out birthday collisions as the cause — it is
      // selection variance, the same class as CDC boundary density); the
      // df boilerplate cut must keep the fingerprint self-join linear.
      ("winnowingPairs", true, "~N", d =>
        graft.dedup.Winnowing.fingerprintPairs(d, k = 3, w = 4,
          minShared = 2, maxDocFreq = 50)),
      // CDC chunking: boundary density depends on each replica's hashed
      // vocabulary (the ~r suffix changes every token hash), so chunk rows
      // are near-linear, not exactly Nx; time/shuffle must stay linear
      ("cdcChunks", true, "~N", d =>
        graft.dedup.ContentChunking.chunks(d, divisor = 16)),
      // Count-Min grid: the OUTPUT must stay bounded at d*w rows at every
      // corpus size — the mergeable-summary/broadcastability claim; the
      // map-combined shuffle should grow far sub-linearly (per-partition
      // combine caps each task's emit at d*w rows)
      ("countMinSketch", true, "flat", { d =>
        val toks = d.select(explode(split(col("text"), "\\s+")).as("token"))
          .filter(col("token") =!= "")
        graft.analytics.CountMin.sketch(toks, "token", depth = 4, width = 512)
      }),
      ("dsirDocScores", false, "N", d =>
        graft.text.Dsir.docScores(d, targetSource = "src0")),
      // local clustering coefficient: one row per node (exactly N×); the
      // compact-forward triangle enumeration must keep wedge fan-out
      // O(√m)-bounded so time/shuffle stay linear on the replicated
      // star+ring communities
      ("clusteringCoeff", true, "N", d =>
        graft.dedup.DupClusters.clusteringCoefficient(communityEdges(d))),
      // HyperBall: audit output is 3 rows at ANY corpus size (flat); the
      // real claim is that per-round state stays nodes·(≤m) rows and the
      // state⋈adjacency shuffle grows linearly with the graph
      ("hyperBall", true, "flat", d =>
        graft.analytics.HyperBall.neighborhoodFunction(
          communityEdges(d), maxHops = 2, m = 32)),
      // bounded BFS from the hub seed set (ids ≡ 0 mod 100 — offset-
      // invariant): reached rows replicate exactly N×; per-round cost is
      // one frontier equi-join + one anti-join
      ("bfsHops", false, "N", { d =>
        val e = communityEdges(d)
        val seeds = d.select(col("doc_id").as("node_id"))
          .filter(col("node_id") % 100 === 0)
        graft.dedup.DupClusters.bfsHops(e, seeds, maxHops = 2)
      }),
      // BLEU components: 4 rows at any corpus size (flat); the gram
      // streams and the (pair, n, gram) join must grow linearly — pairs
      // are the planted near-dups (+5M offset), intra-replica only
      ("bleuNgram", false, "flat", { d =>
        // planted near-dups sit at +5M WITHIN each 10M replica id band, so
        // the pair key keeps the full id (replica offset included) — a
        // mod-10M key would pair candidates with other replicas' references
        val ref = d.filter(col("doc_id") % 10000000L < 5000000L &&
            col("doc_id") % 10 === 0)
          .select(col("doc_id").as("k"), col("text").as("ref"))
        val cand = d.filter(col("doc_id") % 10000000L >= 5000000L)
          .select((col("doc_id") - 5000000L).as("k"),
            col("doc_id").as("pair_id"), col("text").as("cand"))
        graft.text.BleuScore.ngramPrecision(
          cand.join(ref, Seq("k")), "pair_id", "cand", "ref")
      }),
      // multiplier bootstrap: 1 row at any size (flat); the O(n·B) explode
      // is partition-local and the per-replicate aggregate map-combines,
      // so shuffle must stay ~B·partitions rows while time grows linearly
      ("bootstrapCI", false, "flat", d =>
        graft.analytics.Bootstrap.meanCI(d, col("doc_id"),
          col("n_chars").cast("long"), seed = "probe", replicates = 64)),
      // matched pairs: one row per treated unit (exactly N×); deep tier
      // because the first implementation hid an O(rows²) shrinking-frame
      // window that only sf0.1-scale strata exposed (139 s) — this probe
      // exists so that class of defect can never land silently again
      ("matchedPairs", true, "N", d =>
        graft.ops.Matching.nearestControl(d, col("lang"), col("doc_id"),
          col("n_chars").cast("long"), col("doc_id") % 4 === 0)),
      // bounded Bellman-Ford: reached set exactly N× on disjoint replica
      // communities ((u+v)%5 weights are offset-invariant: 5 | 10M)
      ("shortestPaths", false, "N", { d =>
        val e = communityEdges(d)
          .withColumn("w", (col("id_a") + col("id_b")) % 5 + 1)
        val seeds = d.select(col("doc_id").as("node_id"))
          .filter(col("node_id") % 100 === 0)
        graft.dedup.DupClusters.boundedShortestPaths(e, seeds, rounds = 2)
      }),
      // consistent sampling: kept rows ~N (per-replica ids hash fresh),
      // pure pushed-down filter — time must track the scan
      ("consistentSample", false, "~N", d =>
        graft.ops.Sampling.consistentEntitySample(d, col("doc_id"), "probe", 300)),
      // MRR: flat 1-row output; per-group rank windows over ~100-doc
      // groups (div 100 of offset ids stays replica-local)
      ("mrrAtK", false, "flat", d =>
        graft.analytics.Eval.mrrAtK(d, expr("doc_id div 100"),
          col("n_chars").cast("long"), col("doc_id"), col("doc_id") % 7 === 0)),
      // blocked edit-distance ER: keys carry the replica band in the block
      // prefix ("r|<text18>"), so blocks are replica-local by construction
      // (shared prefixes are Levenshtein-neutral, so every replica's pair
      // set replays replica 0's exactly → rows exactly N×). Twins planted
      // at char 11 (inside the prefix's shadow) like q_edit_distance_er.
      // The CANDIDATES op measures the pre-Levenshtein blocked-join volume
      // (Σ|block|²) and the PAIRS ops its verified output at the prefix-4
      // and prefix-6 (heavy-block valve) operating points.
      ("editDistCandidates", true, "N", { d =>
        val keyed = erKeys(d)
          .filter(length(col("k0")) >= 7)
          .withColumn("blk", substring(col("k0"), 1, 7))
        keyed.as("a").hint("shuffle_hash")
          .join(keyed.as("b").hint("shuffle_hash"),
            col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id") &&
              abs(length(col("a.k0")) - length(col("b.k0"))) <= 3)
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      }),
      // prefixLen 7/9 = the query's 4/6 text chars after the 3-char
      // replica header ("rr|")
      ("editDistPairs4", true, "N", d =>
        graft.dedup.Dedup.editDistancePairs(erKeys(d), "k0", maxDist = 3,
          prefixLen = 7, idCol = "doc_id")),
      ("editDistPairs6", true, "N", d =>
        graft.dedup.Dedup.editDistancePairs(erKeys(d), "k0", maxDist = 3,
          prefixLen = 9, idCol = "doc_id")),
      // round-10 bigram-LM path: disjoint replica vocabularies make the
      // pooled pair-count table exactly the union of per-replica tables,
      // so c12 rows must replay N× (the model build is two term-keyed
      // count shuffles — the linearity under test)
      ("bigramModelC12", true, "N", d =>
        graft.text.NgramLm.train(d).c12),
      // the scorer end-to-end: per-doc NLL rows = odd docs with ≥ 1
      // bigram, exactly N×; the threshold pass rides the bounded
      // order-statistic histogram (time should stay near-linear)
      ("pplFilterScores", true, "N", d =>
        graft.text.NgramLm.perplexityFilter(
          d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 =!= 0),
          permille = 900)),
      // ADVERSARIAL value-domain probe: kruskalWallis on an unquantized
      // key-cardinality score (every row its own value) with the
      // maxDistinctValues contract consciously lifted — the rank histogram
      // is DATA-sized, so the broadcast rank map and the single
      // unpartitioned cumulative window grow with the corpus instead of
      // staying metadata-sized. Output is flat (1 row) BY SHAPE; the row
      // exists to measure time/shuffle degradation vs the cents-grid form
      // and to justify the default 2^21 envelope (the guard trip itself is
      // spec-tested in HypothesisSpec).
      ("kwUnboundedDomain", true, "flat", d =>
        graft.analytics.Hypothesis.kruskalWallis(
          d.select((col("doc_id") % 4).cast("string").as("g"),
            col("doc_id").as("cents")),
          "g", "cents", maxDistinctValues = Long.MaxValue)),
      // the SAME statistic on the quantized cents-grid domain (n_chars is
      // length-bounded) — the operating point the envelope prescribes;
      // time/shuffle here must track the scan, not the domain
      ("kwCentsGridDomain", true, "flat", d =>
        graft.analytics.Hypothesis.kruskalWallis(
          d.select((col("doc_id") % 4).cast("string").as("g"),
            col("n_chars").cast("long").as("cents")),
          "g", "cents")),
      // FIM split: one output row per doc (exactly N×), pure stateless
      // projection — zero shuffle at any corpus size is the whole claim
      ("fimSplit", true, "N", d =>
        graft.text.Curation.fimSplit(d)),
      // special-token audit: output bounded by the segment count (flat);
      // one map-combined aggregate — shuffle stays segment-sized
      ("specialTokenAudit", true, "flat", d =>
        graft.text.TextAnalysis.specialTokenAudit(d)),
      // ROUGE-2 over the planted near-dup pairs: 2 rows at any size
      // (flat); the (pair, n, gram) streams and their co-partitioned
      // full-outer join must grow linearly with the pair count
      ("rougeN", false, "flat", { d =>
        val ref = d.filter(col("doc_id") % 10000000L < 5000000L &&
            col("doc_id") % 10 === 0)
          .select(col("doc_id").as("k"), col("text").as("ref"))
        val cand = d.filter(col("doc_id") % 10000000L >= 5000000L)
          .select((col("doc_id") - 5000000L).as("k"),
            col("doc_id").as("pair_id"), col("text").as("cand"))
        graft.text.BleuScore.rougeN(
          cand.join(ref, Seq("k")), "pair_id", "cand", "ref")
      }))

    println(f"${"operator"}%-20s ${"corpus"}%-6s ${"docs"}%8s ${"time_s"}%8s " +
      f"${"shufW_MB"}%9s ${"shufR_MB"}%9s ${"rows_out"}%9s")
    // local-iteration subset (comma-separated op names), like Verify's
    // SPARK_GRAFT_ONLY; unset → full probe
    val onlyOps = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val rows = for {
      (opName, deep, expect, op) <- ops
      if onlyOps.forall(_.contains(opName))
      n <- if (deep) Seq(1, replicas, deepReplicas) else Seq(1, replicas)
    } yield {
      val docs = spark.read.parquet(s"$corpusRoot/x$n")
      val nDocs = docs.count()
      var bestT = Double.MaxValue
      var bw = 0L; var br = 0L
      (1 to 3).foreach { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        graft.Bench.fullyEvaluate(op(docs))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        if (dt < bestT) { bestT = dt; bw = listener.write.get; br = listener.read.get }
      }
      val out = op(docs).count()
      spark.sharedState.cacheManager.clearCache()
      println(f"$opName%-20s x$n%-5s $nDocs%8d $bestT%8.2f " +
        f"${bw / 1e6}%9.1f ${br / 1e6}%9.1f $out%9d")
      (opName, expect, n, nDocs, bestT, bw, br, out)
    }
    // linearity summary: Nx vs 1x ratios per operator, at every probed tier
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (opName, rs) =>
      val one = rs.find(_._3 == 1).get
      rs.filter(_._3 > 1).sortBy(_._3).foreach { big =>
        val expectStr = big._2 match {
          case "flat" => "FLAT (bounded summary)"
          case "~N"   => s"~${big._3} (hash-dependent density)"
          case _      => s"${big._3}.00"
        }
        println(f"[scale] $opName x${big._3}: time x${big._5 / one._5}%.2f, " +
          f"shufW x${big._6.toDouble / one._6}%.2f, " +
          f"rows x${big._8.toDouble / one._8}%.2f (expect $expectStr)")
      }
    }
    spark.stop()
  }
}
