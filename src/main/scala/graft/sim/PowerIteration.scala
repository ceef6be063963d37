package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction by INTEGER power
  * iteration on quantized embeddings — the "which direction dominates this
  * embedding corpus" audit (drift between snapshots, anisotropy before
  * indexing, whitening sanity) without ever materializing the d×d
  * covariance: each iteration is the Gram-vector trick
  * `w = Xᵀ(Xv) = Σᵢ xᵢ (xᵢ·v)`, i.e. one broadcast of the current d-vector,
  * one per-row dot product, and one d-key map-combined aggregate per round.
  *
  * Exactness discipline: float embeddings quantize once to integers
  * (`round(x·1000)` — the [[Similarity.quantizeInt8]] idiom), the init
  * vector is all-ones, and every dot/accumulate is BIGINT — so unlike FP
  * power iteration (whose per-partition sum order perturbs low bits and
  * with them the whole trajectory), the iterate is a pure function of the
  * corpus, partitioning-invariant, and bit-replicable in a verification
  * engine. Between rounds the iterate rescales to magnitude ≤ `scale` by
  * truncated-toward-zero integer division (sign-split into `abs … div` so
  * engines whose `//` floors replay it exactly); headroom:
  * |q|·d·scale²·n ≲ 2^52 for n = 10⁹ docs at d = 64, scale = 10³ — and
  * DECIMAL(38) is the documented widening path beyond that (the
  * `momentsWide` precedent).
  *
  * Convergence is the standard power-method rate (λ₂/λ₁ per round); two
  * rounds suffice for the dominance audit, more rounds are just more of
  * the same plan. Sign follows the init vector deterministically.
  */
object PowerIteration {

  /** Two-round power iteration over `vecCol` (array<float/double>, fixed
    * dim `d`). Returns one row per dimension with the raw and rescaled
    * iterates of both rounds — all exact BIGINTs.
    */
  def topComponent(corpus: DataFrame, d: Int, scale: Int = 1000,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(d >= 2 && d <= 4096, s"d must be in [2,4096], got $d")
    require(scale >= 2, s"scale must be >= 2, got $scale")
    val q = corpus.select(col(idCol).as("vid"),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $scale, 0) AS BIGINT))")
        .as("q"))
    // round 1: v0 = ones, so the dot is the plain element sum
    val withDot1 = q.withColumn("dot1",
      expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
    val ex1 = withDot1.select(col("dot1"), posexplode(col("q")).as(Seq("dim", "qj")))
    val w1 = ex1.groupBy(col("dim")).agg(sum(col("qj") * col("dot1")).as("w1"))
    // sign-split truncating rescale to magnitude <= scale (exact integer)
    def rescaled(w: DataFrame, wc: String, vc: String): DataFrame = {
      val s = w.agg(
        expr(s"greatest(max(abs($wc)) div $scale, CAST(1 AS BIGINT))").as("__s"))
      w.crossJoin(broadcast(s))
        .withColumn(vc,
          when(col(wc) < 0, -expr(s"abs($wc) div __s"))
            .otherwise(expr(s"$wc div __s")))
        .select(col("dim"), col(wc), col(vc))
    }
    val v1 = rescaled(w1, "w1", "v1")
    // round 2: dot against the broadcast d-row v1 table
    val ex = q.select(col("vid"), posexplode(col("q")).as(Seq("dim", "qj")))
    val dot2 = ex.join(broadcast(v1.select(col("dim"), col("v1"))), Seq("dim"))
      .groupBy(col("vid")).agg(sum(col("qj") * col("v1")).as("dot2"))
    val w2 = ex.join(dot2, Seq("vid"))
      .groupBy(col("dim")).agg(sum(col("qj") * col("dot2")).as("w2"))
    val v2 = rescaled(w2, "w2", "v2")
    v1.join(v2, Seq("dim"))
      .select(col("dim"), col("w1"), col("v1"), col("w2"), col("v2"))
  }
}
