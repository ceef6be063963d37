package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BASELINE.md §Amortization's required proof for the corpus-derived
  * materializations in [[PipelineQueries]] (the [[GraphsSpec]] discipline):
  * every once-per-process parquet artifact must equal a from-scratch
  * recomputation off the base `documents` table on the same session. The
  * driver's DuckDB oracles re-derive everything from `documents` on every
  * run, so these tests are the local fast-feedback version of the same
  * contract.
  */
class MaterializationSpec extends SparkSpec {

  private def dir = sf()
  private def docs = PipelineQueries.augmented(graft.Tables.documents(spark, dir))

  test("shinglesParquet ≡ withShingles(augmented documents)") {
    val mat = spark.read.parquet(PipelineQueries.shinglesParquet(spark, dir))
      .select(col("id"), explode(col("sh")).as("shingle"))
    val fresh = graft.dedup.Dedup.withShingles(docs, 5)
      .select(col("id"), explode(col("sh")).as("shingle"))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("shingleTfParquet ≡ shingleTf(augmented documents)") {
    val mat = spark.read.parquet(PipelineQueries.shingleTfParquet(spark, dir))
    val fresh = graft.dedup.Dedup.shingleTf(docs, 5)
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized shingle TF diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("dupPairsParquet ≡ ngramJaccardPairs(augmented documents)") {
    val mat = spark.read.parquet(PipelineQueries.dupPairsParquet(spark, dir))
    val fresh = graft.dedup.Dedup.ngramJaccardPairs(docs, k = 5, threshold = 0.5)
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized near-dup pairs diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("minhashPairsParquet ≡ nearDuplicatesFromShingles(recomputed shingles)") {
    val mat = spark.read.parquet(PipelineQueries.minhashPairsParquet(spark, dir))
    val fresh = graft.dedup.MinHashLSH.nearDuplicatesFromShingles(
      graft.dedup.Dedup.withShingles(docs, 5), numHashes = 64, bands = 16)
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized minhash pair table diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("rawShinglesParquet ≡ withShingles(raw documents)") {
    val mat = spark.read.parquet(PipelineQueries.rawShinglesParquet(spark, dir))
      .select(col("id"), explode(col("sh")).as("shingle"))
    val fresh = graft.dedup.Dedup.withShingles(
        graft.Tables.documents(spark, dir).select(col("doc_id"), col("text")), 5)
      .select(col("id"), explode(col("sh")).as("shingle"))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized raw shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("xsnapShinglesParquet ≡ withShingles(xsnap fixture v2 = base + planted delta)") {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = docs // base (%7 != 0) ∪ delta (%7 == 0) = all raw docs, plus:
      .unionByName(docs.filter(col("doc_id") % 63 === 1)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 63 === 2)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(lit("zqxnear "), col("text")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 63 === 7)
        .select((col("doc_id") + 6000000L).as("doc_id"), col("text")))
    val fresh = graft.dedup.Dedup.withShingles(v2, 5)
      .select(col("id"), explode(col("sh")).as("shingle"))
    val mat = spark.read.parquet(VersionedQueries.xsnapShinglesParquet(spark, dir))
      .select(col("id"), explode(col("sh")).as("shingle"))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized xsnap shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("xsnapStrShinglesParquet ≡ withStringShingles(xsnap fixture v2)") {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = docs
      .unionByName(docs.filter(col("doc_id") % 63 === 1)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 63 === 2)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(lit("zqxnear "), col("text")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 63 === 7)
        .select((col("doc_id") + 6000000L).as("doc_id"), col("text")))
    val fresh = graft.dedup.Dedup.withStringShingles(v2, 5)
      .select(col("id"), explode(col("sh")).as("shingle"))
    val mat = spark.read.parquet(VersionedQueries.xsnapStrShinglesParquet(spark, dir))
      .select(col("id"), explode(col("sh")).as("shingle"))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized xsnap string shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("xsnapBandIndexParquet ≡ band rows recomputed from the v1 corpus") {
    // v1 = the un-planted corpus side (doc_id % 7 != 0)
    val v1 = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text"))
    val fresh = graft.dedup.MinHashLSH.replayableBandRows(
      graft.dedup.MinHashLSH.md5Signatures(
        graft.dedup.Dedup.withStringShingles(v1, 5), 16), 8)
    val mat = spark.read.parquet(VersionedQueries.xsnapBandIndexParquet(spark, dir))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized band index diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("mhIncBandIndexParquet ≡ band table recomputed from the base split") {
    val base = graft.dedup.Dedup.withShingles(
      graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text")), 5)
    val fresh = graft.dedup.MinHashLSH.bandTable(
      graft.dedup.MinHashLSH.signaturesFromShingles(base, 64), 16)
    val mat = spark.read.parquet(VersionedQueries.mhIncBandIndexParquet(spark, dir))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized mh_inc band index diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("positionalShinglesParquet ≡ positionalArrays(augmented documents)") {
    val mat = spark.read.parquet(PipelineQueries.positionalShinglesParquet(spark, dir))
      .select(col("id"), posexplode(col("__sh")).as(Seq("pos", "shingle")))
    val fresh = graft.dedup.Dedup.positionalArrays(docs, 5)
      .select(col("id"), posexplode(col("__sh")).as(Seq("pos", "shingle")))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized positional shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("deconPositionalParquet ≡ positionalArrays(leak-augmented corpus)") {
    val raw = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val bench = raw.filter(col("doc_id") % 97 === 3)
    val corpus = raw.filter(col("doc_id") % 97 =!= 3)
      .unionByName(bench.select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("xleak "), col("text")).as("text")))
      .unionByName(bench.select((col("doc_id") + 4000000L).as("doc_id"),
        concat(concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 25)),
          lit(" zqta zqtb zqtc zqtd")).as("text")))
    val mat = spark.read.parquet(CurationQueries.deconPositionalParquet(spark, dir))
      .select(col("id"), posexplode(col("__sh")).as(Seq("pos", "shingle")))
    val fresh = graft.dedup.Dedup.positionalArrays(corpus, 5)
      .select(col("id"), posexplode(col("__sh")).as(Seq("pos", "shingle")))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized decon positional shingles diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("componentsParquet ≡ connectedComponents(recomputed pairs)") {
    val mat = spark.read.parquet(PipelineQueries.componentsParquet(spark, dir))
    val fresh = graft.dedup.DupClusters.connectedComponents(
      graft.dedup.Dedup.ngramJaccardPairs(docs, k = 5, threshold = 0.5)
        .select(col("id_a"), col("id_b")))
    assert(mat.exceptAll(fresh).isEmpty && fresh.exceptAll(mat).isEmpty,
      "materialized components diverged from the from-scratch build")
    assert(mat.count() > 0L)
  }

  test("bloom fp tables ≡ md5 fingerprints of documents / the aug delta slice") {
    val corpusMat = spark.read.parquet(PipelineQueries.bloomCorpusFpParquet(spark, dir))
    val corpusFresh = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    assert(corpusMat.exceptAll(corpusFresh).isEmpty &&
      corpusFresh.exceptAll(corpusMat).isEmpty,
      "materialized corpus fp table diverged from the from-scratch build")
    val deltaMat = spark.read.parquet(PipelineQueries.bloomDeltaFpParquet(spark, dir))
    val deltaFresh = docs.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    assert(deltaMat.exceptAll(deltaFresh).isEmpty &&
      deltaFresh.exceptAll(deltaMat).isEmpty,
      "materialized delta fp table diverged from augmented()'s >= 1M slice")
    assert(corpusMat.count() > 0L && deltaMat.count() > 0L)
  }
}
