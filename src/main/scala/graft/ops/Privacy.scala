package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators beyond content redaction
  * ([[graft.text.Curation]]'s PII pass):
  *
  *  - [[pseudonym]]: deterministic keyed pseudonymization — the same id
  *    maps to the same opaque token everywhere (joins and aggregates still
  *    work across tables). sha256(secret ‖ id ‖ secret): the keyed-envelope
  *    ("sandwich") construction closes the length-extension hole of a bare
  *    prefix key while staying a pure codegen projection that any SQL
  *    engine with sha256 can replicate. The privacy guarantee is only as
  *    strong as the secret: a low-entropy secret is brute-forceable offline
  *    from a single known (id, pseudonym) pair, so issue a long random key
  *    (and use HMAC-SHA256 via a crypto library where cross-engine SQL
  *    replication of the pseudonym is not required).
  *  - [[kAnonymityRisk]]: the k-anonymity audit — quasi-identifier
  *    combinations observed fewer than k times re-identify their members;
  *    the audit counts risky groups and rows. One aggregate on the
  *    quasi-identifier key, map-side combined.
  */
object Privacy {

  /** Keyed pseudonym for `id` (any type; canonicalized via cast to string). */
  def pseudonym(id: Column, secret: String): Column =
    sha2(concat(lit(secret), lit("|"), id.cast("string"), lit("|"), lit(secret)), 256)

  /** Quasi-identifier groups smaller than `k`, with their sizes. */
  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)

  /** l-diversity audit — k-anonymity's complement: a quasi-identifier group
    * can be large yet still leak if (nearly) every member shares the same
    * SENSITIVE value. Reports each group's size and distinct-sensitive
    * count with the `diverse` verdict (≥ l distinct values). One aggregate
    * on the quasi-identifier key, map-side combined, group-proportional
    * output — same scale shape as [[kAnonymityRisk]].
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
}
