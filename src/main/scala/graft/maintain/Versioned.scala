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
  * file, so a half-written commit is simply invisible. [[commit]] assumes a
  * single writer (the reference serializes writes through cron/Flink the
  * same way); concurrent writers use [[commitAtomic]] /
  * [[commitAtomicChecked]] — the optimistic CAS-on-commit-sequence protocol
  * of a Nessie/Iceberg catalog, with key-overlap validation on retry.
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
                            files: Seq[String]): Unit =
    atomicWrite(fs(spark, tableDir),
      new Path(manifestDir(tableDir), s"v$v.json"), s"version=$v" +: files)

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

  // ---- multi-writer commits (the Nessie/Iceberg optimistic-commit analog:
  // reference `docker-compose.yml:100-119` runs a Nessie catalog whose ref
  // update is a compare-and-swap; this is the same protocol over the
  // manifest store) ----------------------------------------------------

  /** CAS publish of a manifest: stage the content to a hidden tmp file, then
    * rename onto the final name ONLY if no manifest claimed that version
    * first. The version number in the file name IS the commit sequence, so
    * "rename-if-unchanged" degenerates to "rename-if-absent": a writer that
    * lost the race finds `v<N>.json` taken and must re-read the new head.
    *
    * Atomicity of the publish: on HDFS, `rename` with an existing
    * destination fails atomically in the NameNode; on an object store you
    * would use a conditional PUT (`If-None-Match: *`); the local-FS
    * `RawLocalFileSystem` backing tests can overwrite on rename, so the
    * exists-check + rename pair is serialized through a per-table JVM lock —
    * the protocol (stage → check-sequence → publish-or-retry) is what scales,
    * the lock is only the local-FS stand-in for the missing atomic primitive.
    */
  private val casLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def casPublish(f: FileSystem, tableDir: String, p: Path,
                         lines: Seq[String]): Boolean = {
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID().toString}.tmp")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val lock = casLocks.computeIfAbsent(tableDir, _ => new Object)
    val won = lock.synchronized { !f.exists(p) && f.rename(tmp, p) }
    if (!won) f.delete(tmp, false)
    won
  }

  /** Optimistic concurrent APPEND commit: write data files once (to a
    * writer-unique directory — no data is ever rewritten on retry), then
    * loop { read head → carried = head's files → CAS-publish head+1 }. An
    * append merges cleanly against ANY interleaved commit, so losing the
    * race only costs re-reading one manifest; `maxRetries` with linear
    * backoff bounds livelock under a commit storm. Returns the version that
    * actually landed. Both racers keep their data: no lost update, the two
    * appends serialize in whichever order the CAS decides.
    */
  def commitAtomic(df: DataFrame, tableDir: String, maxRetries: Int = 8,
                   backoffMs: Long = 25L): Int = {
    val spark = df.sparkSession
    val dataDir = new Path(tableDir,
      s"data/c_${java.util.UUID.randomUUID().toString}")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = listDataFiles(spark, tableDir, dataDir)
    val f = fs(spark, tableDir)
    var attempt = 0
    while (attempt <= maxRetries) {
      val prev = versions(spark, tableDir)
      val v = prev.lastOption.getOrElse(0) + 1
      val carried = if (prev.nonEmpty) readManifest(spark, tableDir, prev.last)
                    else Seq.empty
      if (casPublish(f, tableDir, new Path(manifestDir(tableDir), s"v$v.json"),
          s"version=$v" +: (carried ++ newFiles)))
        return v
      attempt += 1
      Thread.sleep(backoffMs * attempt) // linear bounded backoff
    }
    throw new java.io.IOException(
      s"commit to $tableDir lost the CAS race $maxRetries times; giving up")
  }

  /** Optimistic commit WITH key-overlap validation (Iceberg's
    * `validateNoConflictingData` analog): the caller claims its rows only
    * touch `df`'s key set and that it read snapshot `expectedVersion`. If
    * the head advanced, the retry loop diffs `expectedVersion → head`
    * ([[changedKeys]] — the same check [[branchConflicts]] uses) and
    * intersects with the incoming keys: disjoint ⇒ the interleaved commits
    * are independent and the append retries cleanly; overlapping ⇒ throws
    * `ConcurrentModificationException` with sample keys, because appending
    * would silently double-write a key both writers touched.
    */
  def commitAtomicChecked(df: DataFrame, tableDir: String, keys: Seq[String],
                          expectedVersion: Int, maxRetries: Int = 8,
                          backoffMs: Long = 25L): Int = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val incomingKeys = df.select(keys.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = versions(spark, tableDir).lastOption.getOrElse(0)
      if (head != expectedVersion) {
        val baseDf =
          if (expectedVersion == 0) read(spark, tableDir).limit(0)
          else read(spark, tableDir, Some(expectedVersion))
        val moved = changedKeys(baseDf, read(spark, tableDir), keys)
        val sample = moved.join(incomingKeys, keys, "inner").limit(5).collect()
        if (sample.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"commit validated against v$expectedVersion but head is v$head " +
              "with overlapping keys: " +
              sample.map(_.toSeq.mkString("(", ",", ")")).mkString(", "))
      }
      commitAtomic(df, tableDir, maxRetries, backoffMs)
    } finally { incomingKeys.unpersist(); () }
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
    // PK NOT NULL, enforced loudly at the table boundary: the plain
    // Upsert operator follows SQL MERGE (null-key rows insert,
    // un-deduplicated), but a VERSIONED table's branch machinery is
    // key-join-based — mergeBranch's semi/anti joins never match NULL
    // keys, so identity-less rows admitted here would silently vanish at
    // the first branch merge. Reject them at write time instead, like any
    // primary-key constraint; the check scans only the incoming batch and
    // stops at the first offender.
    val nullKey = keys.map(org.apache.spark.sql.functions.col(_).isNull)
      .reduce(_ || _)
    require(incoming.filter(nullKey).limit(1).isEmpty,
      s"versioned upsert into $tableDir: key columns ${keys.mkString(",")} " +
        "must be non-null (PK constraint); route identity-less rows to a " +
        "DLQ before the keyed table")
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

  // ---- named branches (the Nessie-catalog analog: reference
  // `config/flink/create.sql:1-13` pins a Nessie `main` ref; this is the
  // same named-ref surface over the manifest store) ---------------------

  /** Branch commits live beside main's: manifests as
    * `_manifests/<branch>.v<K>.json` (the dot keeps them invisible to
    * [[versions]]' `v\d+.json` match), data under `data/<branch>/v<K>`,
    * and the branch ref itself as `_branches/<branch>` recording the main
    * snapshot it forked from. All paths in every manifest are
    * tableDir-relative, so a fast-forward merge is ONE atomic manifest
    * rename on main that adopts the branch head's file list — zero data
    * movement, exactly the metadata-pointer semantics of a catalog ref
    * update. Same single-writer assumption as [[commit]].
    */
  private def branchDir(tableDir: String) = new Path(tableDir, "_branches")

  private def readLines(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.linesIterator.filter(_.nonEmpty).toSeq
  }

  private def atomicWrite(f: FileSystem, p: Path, lines: Seq[String]): Unit = {
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"ref update of ${p.getName} lost a rename race")
  }

  /** Branch names with a committed ref file. */
  def branches(spark: SparkSession, tableDir: String): Seq[String] = {
    val f = fs(spark, tableDir)
    val bd = branchDir(tableDir)
    if (!f.exists(bd)) Seq.empty
    else f.listStatus(bd).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted
  }

  /** The main snapshot version a branch forked from. */
  def branchBase(spark: SparkSession, tableDir: String, name: String): Int = {
    val f = fs(spark, tableDir)
    val p = new Path(branchDir(tableDir), name)
    require(f.exists(p), s"branch $name does not exist")
    readLines(f, p).collectFirst { case s if s.startsWith("base=") =>
      s.stripPrefix("base=").toInt }.get
  }

  /** Local commit numbers on a branch (empty until the first branch commit). */
  def branchVersions(spark: SparkSession, tableDir: String, name: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val md = manifestDir(tableDir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches(java.util.regex.Pattern.quote(name) + "\\.v\\d+\\.json") =>
        s.stripPrefix(name + ".v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Create `name` from a main snapshot (default: current head). Metadata
    * only — the branch starts reading the fork point's files.
    */
  def createBranch(spark: SparkSession, tableDir: String, name: String,
                   fromVersion: Option[Int] = None): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"), s"illegal branch name: $name")
    // a branch named v<digits> would put its data at data/v<k>/..., squarely
    // inside main's commit-directory namespace — refuse at creation
    require(!name.matches("v\\d+"), s"branch name $name collides with main's version namespace")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"no committed snapshots under $tableDir to branch from")
    val base = fromVersion.getOrElse(vs.last)
    require(vs.contains(base), s"snapshot v$base does not exist (have: $vs)")
    val p = new Path(branchDir(tableDir), name)
    require(!f.exists(p), s"branch $name already exists")
    atomicWrite(f, p, Seq(s"branch=$name", s"base=$base"))
  }

  /** Commit `df` to a branch. `append = true` carries the branch head's
    * files forward. Returns the branch-local commit number.
    */
  def commitToBranch(df: DataFrame, tableDir: String, name: String,
                     append: Boolean = true): Int = {
    val spark = df.sparkSession
    val base = branchBase(spark, tableDir, name) // asserts the branch exists
    val prev = branchVersions(spark, tableDir, name)
    // a dropped-then-recreated branch may have left data dirs behind (its
    // files can be live in a merged main manifest, so dropBranch cannot
    // delete them) — number past any surviving data dir, not just past the
    // surviving manifests, or the errorifexists write bricks the branch
    val f0 = fs(spark, tableDir)
    val dataRoot = new Path(tableDir, s"data/$name")
    val dirK =
      if (!f0.exists(dataRoot)) 0
      else f0.listStatus(dataRoot).toSeq.map(_.getPath.getName)
        .collect { case s if s.matches("v\\d+") => s.stripPrefix("v").toInt }
        .maxOption.getOrElse(0)
    val k = math.max(prev.lastOption.getOrElse(0), dirK) + 1
    val dataDir = new Path(tableDir, s"data/$name/v$k")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = listDataFiles(spark, tableDir, dataDir)
    val carried =
      if (!append) Seq.empty
      else if (prev.nonEmpty) readBranchManifest(spark, tableDir, name, prev.last)
      else readManifest(spark, tableDir, base)
    val f = fs(spark, tableDir)
    f.mkdirs(manifestDir(tableDir))
    atomicWrite(f, new Path(manifestDir(tableDir), s"$name.v$k.json"),
      s"version=$k" +: (carried ++ newFiles))
    k
  }

  private def readBranchManifest(spark: SparkSession, tableDir: String,
                                 name: String, k: Int): Seq[String] = {
    val f = fs(spark, tableDir)
    readLines(f, new Path(manifestDir(tableDir), s"$name.v$k.json")).drop(1)
  }

  /** Read a branch head (or an earlier branch-local commit). A branch with
    * no local commits reads its fork point.
    */
  def readBranch(spark: SparkSession, tableDir: String, name: String,
                 version: Option[Int] = None): DataFrame = {
    val base = branchBase(spark, tableDir, name)
    val ks = branchVersions(spark, tableDir, name)
    val files = version match {
      case Some(k) =>
        require(ks.contains(k), s"branch $name has no commit v$k (have: $ks)")
        readBranchManifest(spark, tableDir, name, k)
      case None =>
        if (ks.isEmpty) readManifest(spark, tableDir, base)
        else readBranchManifest(spark, tableDir, name, ks.last)
    }
    spark.read.parquet(files.map(p => s"$tableDir/$p"): _*)
  }

  /** Keys whose rows changed (insert, update, or delete) between two table
    * states — bag-semantics diff per side, keys deduped. Hash anti-joins,
    * one shuffle per direction, never collects.
    */
  private def changedKeys(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    b.exceptAll(a).select(keys.map(col): _*)
      .union(a.exceptAll(b).select(keys.map(col): _*)).distinct()
  }

  /** Keys both main and `name` modified since the fork — the merge
    * conflicts. Empty ⇒ [[mergeBranch]] will succeed.
    */
  def branchConflicts(spark: SparkSession, tableDir: String, name: String,
                      keys: Seq[String]): DataFrame = {
    val base = read(spark, tableDir, Some(branchBase(spark, tableDir, name)))
    val mainChanged = changedKeys(base, read(spark, tableDir), keys)
    val branchChanged = changedKeys(base, readBranch(spark, tableDir, name), keys)
    mainChanged.join(branchChanged, keys, "inner")
  }

  /** Merge a branch into main. Fast-forward when main has not advanced past
    * the fork point: the new main manifest simply adopts the branch head's
    * file list (metadata-only, no data IO — the catalog-ref-update fast
    * path). Diverged: key-level three-way merge — main rows keep every key
    * the branch didn't touch, branch rows win for keys it did (inserts and
    * updates carry over; branch deletes drop the key) — REFUSED with the
    * offending keys if both sides modified the same key. Returns the new
    * main version. The pre-merge main head stays time-travelable.
    */
  def mergeBranch(spark: SparkSession, tableDir: String, name: String,
                  keys: Seq[String]): Int = {
    import org.apache.spark.sql.functions.col
    val base = branchBase(spark, tableDir, name)
    val mainHead = versions(spark, tableDir).last
    val ks = branchVersions(spark, tableDir, name)
    if (mainHead == base) {
      // fast-forward: adopt the branch head's manifest as the next main
      // snapshot (a branch with no commits merges to a no-op new snapshot)
      val files =
        if (ks.isEmpty) readManifest(spark, tableDir, base)
        else readBranchManifest(spark, tableDir, name, ks.last)
      val v = mainHead + 1
      writeManifest(spark, tableDir, v, files)
      v
    } else {
      // one diff pass each side: branchTouched feeds both the conflict
      // check and the merge itself (branchConflicts would recompute it)
      val baseDf = read(spark, tableDir, Some(base))
      val branchHead = readBranch(spark, tableDir, name)
      val main = read(spark, tableDir)
      val branchTouched = changedKeys(baseDf, branchHead, keys)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sample = changedKeys(baseDf, main, keys)
        .join(branchTouched, keys, "inner").limit(5).collect()
      if (sample.nonEmpty) {
        branchTouched.unpersist()
        throw new IllegalStateException(
          s"merge of branch $name conflicts on keys: " +
            sample.map(_.toSeq.mkString("(", ",", ")")).mkString(", "))
      }
      val untouched = main.join(branchTouched, keys, "left_anti")
      val fromBranch = branchHead.join(branchTouched, keys, "left_semi")
      val v = commit(untouched.unionByName(fromBranch), tableDir, append = false)
      branchTouched.unpersist()
      v
    }
  }

  /** Delete a branch ref and its manifests; its data files become orphans
    * for [[removeOrphanFiles]].
    */
  def dropBranch(spark: SparkSession, tableDir: String, name: String): Unit = {
    val f = fs(spark, tableDir)
    branchVersions(spark, tableDir, name).foreach(k =>
      f.delete(new Path(manifestDir(tableDir), s"$name.v$k.json"), false))
    f.delete(new Path(branchDir(tableDir), name), false)
    ()
  }

  /** M3 `expire_snapshots`: drop all but the newest `keepLast` manifests.
    * Data files shared with retained snapshots stay; newly-unreferenced files
    * become orphans for [[removeOrphanFiles]]. Metadata-only — O(#snapshots).
    */
  def expireSnapshots(spark: SparkSession, tableDir: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    // a live branch's fork point must stay readable (its merge base and the
    // head of a commit-less branch) — the ref pins the snapshot, as in any
    // catalog with named refs
    val pinned = branches(spark, tableDir)
      .map(b => branchBase(spark, tableDir, b)).toSet
    val expired = vs.dropRight(keepLast).filterNot(pinned)
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
    val referenced = (versions(spark, tableDir)
        .flatMap(v => readManifest(spark, tableDir, v)) ++
      branches(spark, tableDir).flatMap(b =>
        branchVersions(spark, tableDir, b)
          .flatMap(k => readBranchManifest(spark, tableDir, b, k)))).toSet
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
