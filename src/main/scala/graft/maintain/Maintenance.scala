package graft.maintain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators (SURVEY.md §2.11) over a plain-parquet,
  * directory-partitioned layout — the Spark analog of the reference's Trino
  * `DELETE`/`optimize`/`ANALYZE` cycle (`config/flink/cleanup.sql`).
  */
object Maintenance {

  /** Retention predicate (K5/P6): rows *surviving* `DELETE WHERE dayCol <
    * asOf - days` (`cleanup.sql:5-10`; 5d maxtrack raw, 90d others).
    *
    * NULL days survive: SQL DELETE removes rows whose predicate is TRUE,
    * and `NULL < cutoff` is NULL — so a row with no day is NOT deleted.
    * The naive survivor filter `dayCol >= cutoff` would silently drop it
    * (the three-valued inversion trap), and would also disagree with
    * [[retentionDelete]], whose partition-directory sweep never matches
    * the null (`__HIVE_DEFAULT_PARTITION__`) directory against a date
    * cutoff. An un-dated row is a data-quality finding for the DLQ
    * discipline, not something a retention pass may silently destroy.
    */
  def retain(df: DataFrame, dayCol: String, days: Int, asOf: java.time.LocalDate): DataFrame =
    df.filter(col(dayCol).isNull ||
      col(dayCol) >= lit(java.sql.Date.valueOf(asOf.minusDays(days.toLong))))

  /** Apply retention in place on a `dayCol`-partitioned parquet path: deletes
    * whole expired partitions (metadata-only file deletes, no rewrite) — at
    * 100 TB this must never be a read-rewrite of surviving data.
    */
  def retentionDelete(spark: SparkSession, path: String, dayCol: String,
                      days: Int, asOf: java.time.LocalDate): Seq[String] = {
    val cutoff = asOf.minusDays(days.toLong).toString
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expired = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith(s"$dayCol=") && n.stripPrefix(s"$dayCol=") < cutoff
      }
    expired.foreach(p => fs.delete(p, true))
    expired.map(_.toString)
  }

  /** Compaction (M1, `cleanup.sql:12-17`): rewrite one day-partition into
    * `ceil(bytes / targetFileSize)` files. Reads only the named partition —
    * the per-partition `WHERE received_day = …` form of the reference's
    * `optimize`, which is the only form that scales.
    */
  def compactPartition(spark: SparkSession, path: String, dayCol: String,
                       day: String, targetFileBytes: Long = 256L << 20): Unit = {
    val partPath = s"$path/$dayCol=$day"
    val fs = new org.apache.hadoop.fs.Path(partPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(partPath))) return
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(partPath)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(partPath)
    val tmp = s"$partPath.__compact_tmp"
    df.coalesce(nFiles).write.mode("overwrite").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(partPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(partPath))
  }

  /** Compaction *planning* (the decision half of M1, `cleanup.sql:12-17`):
    * assign each file to a rewrite bin by greedy capacity-restart packing —
    * walk the partition's files in file-id order accumulating size, start a
    * new bin whenever adding the next file would exceed `capacity` (a file
    * larger than the capacity gets a bin to itself). This is the plan an
    * OPTIMIZE implementation executes (each bin = one rewrite task ≈ one
    * output file), and emitting it as a table makes the policy auditable
    * before any data is moved.
    *
    * The greedy fold is inherently sequential *within a partition*
    * (bin(i) depends on the exact fill after file i−1 — not a window
    * function), so this drops to `flatMapGroups` per partition. That is the
    * right trade at 100 TB: the input is the FILE MANIFEST, not data —
    * ~10⁶ rows for a 100 TB / 100 MB-file table, thousands of partitions
    * processed in parallel, each group a few-KB sorted list. Output schema:
    * `(part, file_id, file_size, bin)`.
    */
  def compactionPlan(files: DataFrame, capacity: Long,
                     partCol: String = "part", fileCol: String = "file_id",
                     sizeCol: String = "file_size"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val rows = files.select(col(partCol).cast("long"), col(fileCol).cast("long"),
      col(sizeCol).cast("long")).as[(Long, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (part, it) =>
      var fill = 0L
      var bin = 0L
      var first = true
      it.toSeq.sortBy(_._2).map { case (_, fid, sz) =>
        if (!first && fill + sz > capacity) { bin += 1; fill = 0L }
        first = false
        fill += sz
        (part, fid, sz, bin)
      }
    }.toDF(partCol, fileCol, sizeCol, "bin")
  }

  /** Stats refresh (M4, `cleanup.sql:33-38`): ANALYZE over a catalog table. */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    val forCols = if (columns.nonEmpty) s" FOR COLUMNS ${columns.mkString(", ")}" else ""
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS$forCols")
  }

  /** Dynamic partition overwrite: rewrite only the partitions present in `df`
    * — the write half of the upsert-at-scale pattern (pairs with
    * `Upsert.upsert` output restricted to changed partitions).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
