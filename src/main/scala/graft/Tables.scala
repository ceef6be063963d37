package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet testdata (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-table scans; everything
  * downstream only assumes "a DataFrame with this schema", so swapping
  * `parquet(dir)` for a catalog table (Delta/Iceberg) is a one-line change.
  * Filters/projections applied by callers are pushed into the parquet scan
  * by Catalyst (verify with .explain: PushedFilters / ReadSchema).
  */
object Tables {
  /** Parquet schemas memoized per path (process-wide). A bare
    * `spark.read.parquet(path)` re-infers the schema from file footers on
    * EVERY call (~80-90 ms even for a 5-row table, measured on this host);
    * a catalog-backed table (Hive/Delta/Iceberg) instead carries its schema
    * in table metadata, so scan setup never re-reads footers. This memo
    * reproduces the catalog behavior for the driver's path-addressed
    * testdata: infer once per process, then `spark.read.schema(memo)` (~15 ms
    * — listing + relation setup only, and each call still mints fresh
    * attribute IDs, so self-joins of two loads remain unambiguous).
    * CONTRACT: only for write-once paths (the read-only driver testdata and
    * write-once fixtures); a path rewritten with a different schema would be
    * served stale.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Test hook (Scratch A/Bs only): bypass the schema memo so reads pay the
    * footer-inference path — lets an A/B separate memo effects from host
    * phase inside one session. Never set outside dev tools.
    */
  @volatile private[graft] var bypassSchemaMemo: Boolean = false

  /** Schema-memoized parquet read for write-once paths (see [[schemaMemo]]).
    * Only the SCHEMA is memoized — file listing still happens per call, so a
    * path whose DATA is rewritten (same schema) is served fresh.
    */
  def cachedParquet(spark: SparkSession, path: String): DataFrame =
    if (bypassSchemaMemo) spark.read.parquet(path)
    else {
      val s = schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)
      spark.read.schema(s).parquet(path)
    }

  /** Memoized parquet schema of a write-once path (one footer read per
    * process — the catalog-metadata analogue for `readStream.schema(...)`
    * sources and other schema-only consumers).
    */
  def parquetSchema(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType =
    schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cachedParquet(spark, s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** `events.ts` normalized to session-local TIMESTAMP regardless of the
    * parquet generation: TIMESTAMP(NANOS) arrives as a nano-epoch long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` and is converted in exact
    * integer space (`div` — a double division would lose precision above
    * 2^53 ns); TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    * TIMESTAMP_NTZ and is cast (epoch-preserving: every graft entrypoint
    * runs with session TZ UTC). Downstream code can then rely on
    * `unix_micros`/watermarks/`cast(long)` uniformly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
