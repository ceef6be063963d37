package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Vocabulary coverage auditing for tokenizer/serving pipelines: fix a
  * frequency-ranked top-V vocabulary, then measure each source's
  * out-of-vocabulary token rate — the signal that decides whether a
  * tokenizer (or embedding table) trained on one mix transfers to another.
  *
  * Scale shape: the corpus-frequency aggregate is one map-combined shuffle;
  * the top-V cut plans as TakeOrderedAndProject (per-partition local top-V,
  * no global sort) with the total (count, term) order making the cut
  * deterministic under ties; V is bounded (vocab-sized), so the vocabulary
  * broadcasts back onto the token stream — the audit never shuffles the
  * corpus a second time. Token arrays are materialized before the explode
  * (NOTES rule 1).
  */
object Vocab {

  private def tokens(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"), split(col("text"), "\\s+").as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    tok.select(col("source"), explode(col("t")).as("term"))
  }

  private def topOf(toks: DataFrame, v: Int): DataFrame =
    toks
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(v)
      .select(col("term"))

  /** The top-`v` terms by corpus frequency; ties cut by term text so the
    * vocabulary is a pure function of the corpus.
    */
  def topVocab(docs: DataFrame, v: Int): DataFrame = topOf(tokens(docs), v)

  /** Per-source token count, OOV count against the top-`v` vocabulary, and
    * the OOV rate (one division of exact longs). The token stream is built
    * (and its array frame persisted) ONCE and shared by the vocabulary cut
    * and the audit join — the corpus is tokenized a single time.
    */
  def oovRate(docs: DataFrame, v: Int = 500): DataFrame = {
    val toks = tokens(docs)
    val voc = topOf(toks, v).withColumn("__in", lit(1))
    toks
      .join(broadcast(voc), Seq("term"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }
}
