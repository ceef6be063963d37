package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-engine training of a linear text classifier — the batch perceptron
  * over hashed bag-of-words features (the fastText-style quality/domain
  * classifier a curation pipeline trains ON the corpus it is about to
  * filter; cf. the CCNet/GPT-3 quality-classifier stage).
  *
  * Exactness: features are INTEGER token counts in `dim` hashed buckets
  * (`md5U32(token) mod dim` — the engine-portable uniform), labels are ±1,
  * weights start at 0 and every update is an integer sum — so after any
  * number of batch rounds the weight vector, margins, and error counts are
  * exact BIGINTs that hash-compare across engines. No learning rate (the
  * classic perceptron update), no floats anywhere.
  *
  * Batch semantics (round r): margin_d = Σ_b w[b]·x[d,b] + bias; every doc
  * with y_d·margin_d ≤ 0 is misclassified and contributes y_d·x[d,·] to
  * Δw and y_d to Δbias — the deterministic "update on all errors at once"
  * variant (per-row sequential SGD is order-dependent and therefore not
  * cluster-reproducible; batch is, and parallelizes).
  *
  * Scale shape per round: ONE broadcast join of the (dim+1)-row weight
  * table onto the sparse (doc, bucket, cnt) feature frame, one margin
  * aggregate keyed by doc, one update aggregate keyed by bucket — two
  * map-combined shuffles per round, rounds a small constant. The feature
  * frame is built once and persisted; weights never leave metadata size.
  */
object Perceptron {

  private def md5U32(c: Column): Column =
    graft.functions.Md5Field.md5U32(c)

  /** Sparse hashed features: (doc, bucket, cnt) + per-doc label from
    * `labelCol` (must be ±1). Bucket = md5U32(token) mod dim.
    */
  def features(docs: DataFrame, dim: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"), graft.dedup.Dedup.tokens(col(textCol)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    tok.select(col("doc"), explode(col("t")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc"), pmod(md5U32(col("w")), lit(dim)).as("bucket"))
      .groupBy(col("doc"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Train `rounds` batch-perceptron rounds; returns the per-round audit
    * (round, n_errors, w_l1, bias) — n_errors is the misclassification
    * count entering the round (round 1 sees w=0, so every doc with a
    * nonempty feature row errors), w_l1 = Σ|w| AFTER the round's update.
    * All BIGINT. `labels` is (doc, y) with y ∈ {−1, +1}.
    */
  def trainAudit(feats: DataFrame, labels: DataFrame, dim: Int,
                 rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8], got $rounds")
    val f = feats.join(labels, Seq("doc")).persist(StorageLevel.MEMORY_AND_DISK)
    // weights live as a driver-side metadata array (dim is bounded by
    // construction); every round reads them as literals — the broadcast
    // join degenerates to a codegen'd CASE over `bucket`, the exact shape
    // a dim≤O(10⁵) table broadcasts to executors at cluster scale
    var w = Array.fill(dim)(0L)
    var bias = 0L
    val audit = (1 to rounds).map { r =>
      val wCol = // Σ_b w[b]·x[b]: only nonzero weights enter the expression
        w.zipWithIndex.collect { case (wt, b) if wt != 0L =>
          when(col("bucket") === b, lit(wt) * col("cnt")).otherwise(0L)
        }.reduceOption(_ + _).getOrElse(lit(0L))
      val margins = f
        .groupBy(col("doc"), col("y"))
        .agg((sum(wCol) + lit(bias)).as("m"))
        .filter(col("y") * col("m") <= 0L)
        .select(col("doc"), col("y"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nErr = margins.count()
      val upd = f.join(margins.select(col("doc")), Seq("doc"), "left_semi")
        .groupBy(col("bucket"))
        .agg(sum(col("y") * col("cnt")).as("dw"))
        .collect()
      val dBias = margins.agg(coalesce(sum(col("y")), lit(0L))).head().getLong(0)
      upd.foreach(row => w(row.getAs[Long]("bucket").toInt) += row.getAs[Long]("dw"))
      bias += dBias
      margins.unpersist()
      (r, nErr, w.map(math.abs).sum, bias)
    }
    val spark = feats.sparkSession
    import spark.implicits._
    audit.toDF("round", "n_errors", "w_l1", "bias")
      .select(col("round"), col("n_errors"), col("w_l1"), col("bias"))
  }
}
