package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash document fingerprints (Charikar '02; Manku/Jain/Sarma WWW'07
  * near-duplicate detection).
  *
  * 64-bit fingerprint: each token votes ±1 on every bit position of its
  * 64-bit hash; fingerprint bit k is 1 iff the vote sum is positive.
  * Near-duplicates = fingerprints within `maxHamming` bits, found via the
  * Manku block trick: two fingerprints within d bits must agree exactly on at
  * least one of d+1 blocks — candidates come from an equi-join on
  * (block_idx, block_value), then exact `bit_count(xor)` verification.
  *
  * All bit arithmetic is Catalyst expressions (shiftright/bitwise and/xor,
  * `bit_count`) — codegen'd, shuffle only on block buckets.
  */
object SimHash {

  /** doc_id, 64-bit simhash fingerprint. Tokens materialize in their own
    * projection and the corpus is repartitioned first — see [[Dedup]]'s
    * evaluation rules.
    */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(parallelism)
      .withColumn("__toks", Dedup.tokens(col("__text")))
      .select(col("id"), transform(col("__toks"), t => xxhash64(t)).as("hs"))
      .filter(size(col("hs")) > 0)
      // votes[k] = sum over tokens of (bit k set ? +1 : -1); shiftright/left
      // with a *column* bit-count needs call_function (the Scala wrappers
      // only take Int)
      .withColumn("fp",
        aggregate(
          sequence(lit(0), lit(63)),
          lit(0L),
          (acc, k) => acc + when(
            aggregate(col("hs"), lit(0L),
              (a, h) => a + when(
                call_function("shiftright", h, k).bitwiseAND(lit(1L)) === 1L, 1L)
                .otherwise(-1L)
            ) > 0L,
            call_function("shiftleft", lit(1L), k)).otherwise(0L)))
      .select(col("id"), col("fp"))
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming via block-join. */
  def nearDuplicates(docs: DataFrame, maxHamming: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val fps = fingerprints(docs, idCol, textCol)
    val blocked = fps.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(blocks - 1)),
        j => call_function("shiftright", col("fp"), j * width)
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("block", "key")))
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
