package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-encoding primitives for model-training pipelines: leakage-safe
  * target encoding and the hashing trick. Both are exact-integer
  * constructions — category statistics and hashed counts are BIGINTs,
  * every emitted rate is ONE gated division — so encoded features
  * hash-compare across engines.
  */
object Encoding {

  /** Leave-one-out target encoding of a categorical column: each row gets
    * its category's label mean EXCLUDING itself, enc = (Σy(cat) − y) /
    * (n(cat) − 1) — the standard high-cardinality-categorical feature
    * that, unlike a plain category mean, does not leak the row's own
    * label into its own feature (the difference between offline CV
    * metrics that hold up and ones that don't). Singleton categories
    * gate to NULL (there is no "other rows" mean); the global prior
    * rides along for downstream imputation.
    *
    * Scale shape: ONE map-combined aggregate to |categories| rows,
    * broadcast back over the fact — the fact table never shuffles. At
    * web-scale cardinality (categories beyond broadcast size) swap the
    * hint for a plain equi-join; the algebra is unchanged.
    */
  def targetEncodeLOO(df: DataFrame, catCol: Column, label: Column): DataFrame = {
    val base = df.withColumn("__cat", catCol).withColumn("__y", label.cast("long"))
    val stats = base.groupBy(col("__cat"))
      .agg(sum(col("__y")).as("__cat_sum"), count(lit(1)).as("__cat_cnt"))
    val prior = base.agg(
      sum(col("__y")).as("__tot_sum"), count(lit(1)).as("__tot_cnt"))
    base
      .join(broadcast(stats), Seq("__cat"))
      .crossJoin(broadcast(prior))
      .withColumn("enc_loo",
        when(col("__cat_cnt") > 1,
          (col("__cat_sum") - col("__y")).cast("double") /
            (col("__cat_cnt") - 1).cast("double")))
      .withColumn("prior",
        when(col("__tot_cnt") > 0,
          col("__tot_sum").cast("double") / col("__tot_cnt").cast("double")))
      .drop("__cat", "__cat_sum", "__tot_sum", "__tot_cnt")
      .withColumnRenamed("__y", "y")
      .withColumnRenamed("__cat_cnt", "cat_cnt")
  }

  /** The hashing trick (Weinberger et al., "Feature Hashing for Large
    * Scale Multitask Learning", ICML 2009): whitespace tokens of
    * `textCol` land in `k` hashed feature slots; emitted SPARSE as
    * `(doc, idx, cnt, signed_sum)` rows — `cnt` the plain collision-summed
    * count and `signed_sum` the ±1-signed variant whose collisions cancel
    * in expectation (the paper's unbiased inner-product construction).
    * Hash and sign are two independent fields of the md5U32 uniform, so
    * the layout replays bit-exactly anywhere.
    *
    * Sparse IS the scale shape: a dense k-vector per document multiplies
    * storage by k/|distinct tokens|; the sparse rows aggregate
    * map-side and downstream dot products are (doc, idx)-keyed joins.
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 1024): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val u32 = conv(substring(md5(concat(lit("fh:"), col("tok"))), 1, 8), 16, 10)
      .cast("long")
    docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc"), pmod(u32, lit(k.toLong)).as("idx"),
        when(pmod((u32 / k).cast("long"), lit(2L)) === 0, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc"), col("idx"))
      .agg(count(lit(1)).as("cnt"), sum(col("sgn")).as("signed_sum"))
  }
}
