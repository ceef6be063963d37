package graft.maintain

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based table versioning over plain parquet — the analog of the
  * reference's Iceberg snapshot surface (time travel, `expire_snapshots`,
  * `remove_orphan_files`; see `/root/reference/config/flink/cleanup.sql:19-31`
  * and the Nessie catalog in `config/flink/create.sql:1-13`) rebuilt on
  * nothing but the Hadoop `FileSystem` API, since no table-format jars exist
  * offline.
  *
  * Layout:
  * {{{
  *   table/
  *     data/v<N>/part-*.parquet    files written by commit N
  *     _manifests/v<N>.json        snapshot N = list of data files it reads
  * }}}
  *
  * The **manifest rename is the commit point**: data files are written first
  * (unreferenced until the manifest lands — a crash leaves only orphans, never
  * a corrupt table), then the manifest is staged and atomically renamed.
  * Readers resolve a snapshot by listing `_manifests` — no mutable pointer
  * file, so a half-written commit is simply invisible. Single writer assumed
  * (the reference serializes writes through cron/Flink the same way); at
  * scale, CAS the manifest create against a lock service or catalog.
  *
  * Append commits reference the previous snapshot's files plus the new ones —
  * old snapshots stay readable (time travel) until expired.
  */
object Versioned {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(tableDir: String) = new Path(tableDir, "_manifests")

  /** Sorted snapshot versions present (committed manifests only). */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val md = manifestDir(tableDir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  private def readManifest(spark: SparkSession, tableDir: String, v: Int): Seq[String] = {
    val f = fs(spark, tableDir)
    val in = f.open(new Path(manifestDir(tableDir), s"v$v.json"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // manifest format: one relative path per line after the version header —
    // line-oriented to avoid hand-rolled JSON parsing
    txt.linesIterator.drop(1).filter(_.nonEmpty).toSeq
  }

  private def writeManifest(spark: SparkSession, tableDir: String, v: Int,
                            files: Seq[String]): Unit = {
    val f = fs(spark, tableDir)
    f.mkdirs(manifestDir(tableDir))
    val tmp = new Path(manifestDir(tableDir), s".v$v.json.tmp")
    val out = f.create(tmp, true)
    try out.write((s"version=$v" +: files).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(manifestDir(tableDir), s"v$v.json")))
      throw new java.io.IOException(s"commit of v$v lost a rename race")
  }

  /** Relative data-file paths under `tableDir` for commit directory `dataDir`. */
  private def listDataFiles(spark: SparkSession, tableDir: String,
                            dataDir: Path): Seq[String] = {
    val f = fs(spark, tableDir)
    val base = new Path(tableDir).toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = f.listFiles(dataDir, true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      if (st.isFile && p.endsWith(".parquet"))
        out += p.stripPrefix(base).stripPrefix("/")
    }
    out.toSeq.sorted
  }

  /** Commit `df` as a new snapshot. `append = true` carries the previous
    * snapshot's files forward; `false` is a logical overwrite (old files stay
    * on disk for time travel until expired). Returns the new version.
    */
  def commit(df: DataFrame, tableDir: String, append: Boolean = true): Int = {
    val spark = df.sparkSession
    val prev = versions(spark, tableDir)
    val v = prev.lastOption.getOrElse(0) + 1
    val dataDir = new Path(tableDir, s"data/v$v")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = listDataFiles(spark, tableDir, dataDir)
    val carried = if (append && prev.nonEmpty)
      readManifest(spark, tableDir, prev.last) else Seq.empty
    writeManifest(spark, tableDir, v, carried ++ newFiles)
    v
  }

  /** Read a snapshot (default: latest). Time travel = pass an old version. */
  def read(spark: SparkSession, tableDir: String,
           version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"no committed snapshots under $tableDir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"snapshot v$v does not exist (have: $vs)")
    val files = readManifest(spark, tableDir, v).map(p => s"$tableDir/$p")
    spark.read.parquet(files: _*)
  }

  /** MERGE INTO as a snapshot commit: read the current snapshot, apply the
    * key-dedup merge ([[graft.ops.Upsert]]), commit as a logical overwrite.
    * The manifest rename makes the merge atomic — readers see the old or the
    * new table, never a partial rewrite (strictly stronger than the
    * backup-swap file dance in `StreamingIngest.upsertFullSwap`) — and the
    * pre-merge snapshot stays time-travelable until expired. New data files
    * land in a fresh `data/v<N>` directory, so the merge never overwrites
    * files it is still reading.
    */
  def upsert(incoming: DataFrame, tableDir: String, keys: Seq[String],
             precedence: org.apache.spark.sql.Column): Int = {
    val spark = incoming.sparkSession
    val existing =
      if (versions(spark, tableDir).isEmpty) incoming.limit(0)
      else read(spark, tableDir)
    val merged = graft.ops.Upsert.upsert(existing, incoming, keys, precedence, precedence)
    commit(merged, tableDir, append = false)
  }

  /** Change feed between two snapshots: rows only in `to` tagged `insert`,
    * rows only in `from` tagged `delete` (an update under [[upsert]] shows as
    * delete+insert of the key). `exceptAll` is bag semantics — duplicate rows
    * diff by multiplicity — and plans as a hash anti-join per side, so the
    * diff shuffles once per direction and never collects.
    */
  def snapshotDiff(spark: SparkSession, tableDir: String,
                   from: Int, to: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = read(spark, tableDir, Some(from))
    val b = read(spark, tableDir, Some(to))
    b.exceptAll(a).withColumn("__change", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("__change", lit("delete")))
  }

  /** M3 `expire_snapshots`: drop all but the newest `keepLast` manifests.
    * Data files shared with retained snapshots stay; newly-unreferenced files
    * become orphans for [[removeOrphanFiles]]. Metadata-only — O(#snapshots).
    */
  def expireSnapshots(spark: SparkSession, tableDir: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    val expired = vs.dropRight(keepLast)
    expired.foreach(v => f.delete(new Path(manifestDir(tableDir), s"v$v.json"), false))
    expired
  }

  /** M2 `remove_orphan_files`: delete data files no retained manifest
    * references — crash debris and expired-snapshot remnants. `minAgeMs`
    * protects data of in-flight commits (files younger than the horizon are
    * kept even if unreferenced), exactly Iceberg's `older_than` guard.
    */
  def removeOrphanFiles(spark: SparkSession, tableDir: String,
                        minAgeMs: Long = 0L): Seq[String] = {
    val f = fs(spark, tableDir)
    val referenced = versions(spark, tableDir)
      .flatMap(v => readManifest(spark, tableDir, v)).toSet
    val dataRoot = new Path(tableDir, "data")
    if (!f.exists(dataRoot)) return Seq.empty
    val base = new Path(tableDir).toUri.getPath
    val horizon = System.currentTimeMillis() - minAgeMs
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    val it = f.listFiles(dataRoot, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      // only data files: committer markers (_SUCCESS) are not manifest-tracked
      if (st.isFile && rel.endsWith(".parquet") &&
          !referenced.contains(rel) && st.getModificationTime <= horizon) {
        f.delete(st.getPath, false)
        deleted += rel
      }
    }
    deleted.toSeq.sorted
  }
}
