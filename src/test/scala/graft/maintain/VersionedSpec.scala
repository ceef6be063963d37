package graft.maintain

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString + "/t"

  test("append commits accumulate; every snapshot stays readable (time travel)") {
    val dir = freshTable()
    val v1 = Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    val v2 = Versioned.commit(Seq((2L, "b")).toDF("id", "s"), dir)
    assert((v1, v2) == ((1, 2)))
    assert(Versioned.read(spark, dir).count() == 2)                  // latest
    assert(Versioned.read(spark, dir, Some(1)).as[(Long, String)].collect().toSeq
      == Seq((1L, "a")))                                             // time travel
  }

  test("overwrite commit replaces content logically, old snapshot readable") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), dir, append = false)
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(Versioned.read(spark, dir, Some(1)).as[(Long, String)].collect().toSeq
      == Seq((1L, "a")))
  }

  test("expire + orphan removal: old files deleted, current snapshot intact") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), dir, append = false) // v1 files now v1-only
    val expired = Versioned.expireSnapshots(spark, dir, keepLast = 1)
    assert(expired == Seq(1))
    val gone = Versioned.removeOrphanFiles(spark, dir)
    assert(gone.nonEmpty && gone.forall(_.startsWith("data/v1/")))
    // current snapshot unaffected by the cleanup
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    intercept[IllegalArgumentException](Versioned.read(spark, dir, Some(1)))
  }

  test("orphan removal keeps shared files still referenced by a retained snapshot") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    Versioned.commit(Seq((2L, "b")).toDF("id", "s"), dir) // append: v2 references v1 files
    Versioned.expireSnapshots(spark, dir, keepLast = 1)   // drop v1 manifest
    val gone = Versioned.removeOrphanFiles(spark, dir)
    assert(gone.isEmpty, s"shared v1 data files wrongly deleted: $gone")
    assert(Versioned.read(spark, dir).count() == 2)
  }

  test("versioned upsert merges by key atomically; pre-merge snapshot time-travels") {
    import org.apache.spark.sql.functions.col
    val dir = freshTable()
    Versioned.upsert(Seq(("d1", 5L, 1), ("d2", 7L, 1)).toDF("k", "total", "ver"),
      dir, Seq("k"), col("ver"))
    Versioned.upsert(Seq(("d1", 9L, 2)).toDF("k", "total", "ver"),
      dir, Seq("k"), col("ver"))
    val now = Versioned.read(spark, dir)
      .select("k", "total", "ver").as[(String, Long, Int)].collect().toSet
    assert(now == Set(("d1", 9L, 2), ("d2", 7L, 1)))
    val before = Versioned.read(spark, dir, Some(1))
      .select("k", "total", "ver").as[(String, Long, Int)].collect().toSet
    assert(before == Set(("d1", 5L, 1), ("d2", 7L, 1)))
  }

  test("versioned upsert rejects null-key rows loudly (PK constraint)") {
    // the branch machinery is key-join-based: identity-less rows admitted
    // here would silently vanish at the first mergeBranch — reject at
    // write time instead
    import org.apache.spark.sql.functions.col
    val dir = freshTable()
    val e = intercept[IllegalArgumentException] {
      Versioned.upsert(
        Seq(("d1", 5L, 1), (null.asInstanceOf[String], 6L, 1))
          .toDF("k", "total", "ver"), dir, Seq("k"), col("ver"))
    }
    assert(e.getMessage.contains("non-null"))
    assert(Versioned.versions(spark, dir).isEmpty, "no partial commit")
  }

  test("snapshotDiff: upserts surface as delete+insert of the changed key") {
    import org.apache.spark.sql.functions.col
    val dir = freshTable()
    Versioned.upsert(Seq(("d1", 5L, 1), ("d2", 7L, 1)).toDF("k", "total", "ver"),
      dir, Seq("k"), col("ver"))
    Versioned.upsert(Seq(("d1", 9L, 2), ("d3", 4L, 1)).toDF("k", "total", "ver"),
      dir, Seq("k"), col("ver"))
    val diff = Versioned.snapshotDiff(spark, dir, from = 1, to = 2)
      .select("__change", "k", "total").as[(String, String, Long)].collect().toSet
    assert(diff == Set(
      ("insert", "d1", 9L), ("delete", "d1", 5L),  // updated key
      ("insert", "d3", 4L)))                       // new key; d2 unchanged
  }

  test("branches: isolation, fast-forward merge is metadata-only, drop cleans up") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    Versioned.createBranch(spark, dir, "dev")
    assert(Versioned.branches(spark, dir) == Seq("dev"))
    // commit-less branch reads its fork point
    assert(Versioned.readBranch(spark, dir, "dev").count() == 2)
    Versioned.commitToBranch(Seq((3L, "c")).toDF("id", "s"), dir, "dev")
    // isolation: main unchanged, branch sees the append
    assert(Versioned.read(spark, dir).count() == 2)
    assert(Versioned.readBranch(spark, dir, "dev").count() == 3)
    // main has not advanced -> fast-forward; no new data files under data/v*
    val before = Versioned.versions(spark, dir)
    val v = Versioned.mergeBranch(spark, dir, "dev", Seq("id"))
    assert(v == before.last + 1)
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/v$v")),
      "fast-forward merge wrote data files; it must be metadata-only")
    // drop: branch data becomes orphaned and removable; merged main intact
    Versioned.dropBranch(spark, dir, "dev")
    assert(Versioned.branches(spark, dir).isEmpty)
    val gone = Versioned.removeOrphanFiles(spark, dir)
    assert(gone.isEmpty, s"merged-in branch files wrongly deleted: $gone")
    assert(Versioned.read(spark, dir).count() == 3)
  }

  test("branches: diverged merge is key-level three-way; conflicts refuse") {
    val dir = freshTable()
    Versioned.commit(Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "n"), dir)
    Versioned.createBranch(spark, dir, "dev")
    // main updates a; branch updates b, deletes c, inserts d
    Versioned.commit(Seq(("a", 10L), ("b", 1L), ("c", 1L)).toDF("k", "n"),
      dir, append = false)
    Versioned.commitToBranch(Seq(("a", 1L), ("b", 20L), ("d", 30L)).toDF("k", "n"),
      dir, "dev", append = false)
    assert(Versioned.branchConflicts(spark, dir, "dev", Seq("k")).count() == 0)
    Versioned.mergeBranch(spark, dir, "dev", Seq("k"))
    assert(Versioned.read(spark, dir).as[(String, Long)].collect().toSet ==
      Set(("a", 10L), ("b", 20L), ("d", 30L))) // both edits + delete + insert
    // conflicting branch: both sides touch the same key
    Versioned.createBranch(spark, dir, "clash")
    Versioned.commit(Seq(("a", 11L), ("b", 20L), ("d", 30L)).toDF("k", "n"),
      dir, append = false)
    Versioned.commitToBranch(Seq(("a", 99L), ("b", 20L), ("d", 30L)).toDF("k", "n"),
      dir, "clash", append = false)
    val e = intercept[IllegalStateException](
      Versioned.mergeBranch(spark, dir, "clash", Seq("k")))
    assert(e.getMessage.contains("a"))
    // expire never drops a live branch's fork point
    val base = Versioned.branchBase(spark, dir, "clash")
    Versioned.expireSnapshots(spark, dir, keepLast = 1)
    assert(Versioned.versions(spark, dir).contains(base))
  }

  test("branches: v<digits> names refused; drop-and-recreate can commit again") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // a branch named v2 would write data under main's data/v2 commit dir
    intercept[IllegalArgumentException](Versioned.createBranch(spark, dir, "v2"))
    // dropped branch leaves data dirs (files may be live in merged main);
    // a recreated branch must number past them instead of bricking
    Versioned.createBranch(spark, dir, "dev")
    Versioned.commitToBranch(Seq((2L, "b")).toDF("id", "s"), dir, "dev")
    Versioned.mergeBranch(spark, dir, "dev", Seq("id")) // FF: main references data/dev/v1
    Versioned.dropBranch(spark, dir, "dev")
    Versioned.createBranch(spark, dir, "dev")
    val k = Versioned.commitToBranch(Seq((3L, "c")).toDF("id", "s"), dir, "dev")
    assert(k == 2, s"recreated branch must number past surviving data dirs, got v$k")
    assert(Versioned.readBranch(spark, dir, "dev").count() == 3)
    assert(Versioned.read(spark, dir).count() == 2) // main still pre-second-merge
  }

  test("crash debris (data without manifest) is invisible and cleaned as orphans") {
    val dir = freshTable()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // simulate a crash mid-commit: data written, manifest never landed
    Seq((666L, "crash")).toDF("id", "s")
      .write.parquet(s"$dir/data/v2")
    assert(Versioned.versions(spark, dir) == Seq(1))       // v2 invisible
    assert(Versioned.read(spark, dir).count() == 1)
    val gone = Versioned.removeOrphanFiles(spark, dir)
    assert(gone.nonEmpty && gone.forall(_.startsWith("data/v2/")))
    // age guard: freshly-written unreferenced files survive a guarded sweep
    Seq((7L, "inflight")).toDF("id", "s").write.parquet(s"$dir/data/v3")
    assert(Versioned.removeOrphanFiles(spark, dir, minAgeMs = 3600000L).isEmpty)
  }

  test("two-writer race: concurrent commitAtomic — all commits land, no lost update") {
    val dir = freshTable()
    Versioned.commit(Seq((0L, "base")).toDF("id", "s"), dir)
    // 8 concurrent appends (2 threads × 4 commits each) racing for versions;
    // every commit must land under a unique version and every row survive
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futures = (1 to 2).map { w =>
      Future {
        (1 to 4).map { i =>
          Versioned.commitAtomic(
            Seq((w * 100L + i, s"w$w-$i")).toDF("id", "s"), dir)
        }
      }
    }
    val landed = futures.flatMap(Await.result(_, 120.seconds))
    assert(landed.toSet.size == 8, s"versions must be unique, got $landed")
    assert(Versioned.versions(spark, dir) == (1 to 9), "contiguous history")
    val rows = Versioned.read(spark, dir).as[(Long, String)].collect().toSet
    val expected = Set(0L -> "base") ++
      (for (w <- 1 to 2; i <- 1 to 4) yield (w * 100L + i, s"w$w-$i")).toSet
    assert(rows.map(r => (r._1, r._2)) == expected, "no lost update")
    // each intermediate snapshot is readable and monotonically grows
    val counts = Versioned.versions(spark, dir)
      .map(v => Versioned.read(spark, dir, Some(v)).count())
    assert(counts == counts.sorted && counts.last == 9L)
  }

  test("commitAtomicChecked: disjoint keys retry cleanly, overlapping keys refuse") {
    val dir = freshTable()
    val v1 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    // writer A lands first, advancing the head past what writer B read
    Versioned.commitAtomic(Seq((3L, "c")).toDF("id", "s"), dir)
    // B validated against v1 and touches key 4 only — disjoint from A's key 3
    val vb = Versioned.commitAtomicChecked(
      Seq((4L, "d")).toDF("id", "s"), dir, Seq("id"), expectedVersion = v1)
    assert(vb == 3 && Versioned.read(spark, dir).count() == 4)
    // C also validated against v1 but touches key 3 — A already wrote it
    val ex = intercept[java.util.ConcurrentModificationException] {
      Versioned.commitAtomicChecked(
        Seq((3L, "clobber")).toDF("id", "s"), dir, Seq("id"), expectedVersion = v1)
    }
    assert(ex.getMessage.contains("overlapping keys"))
    // the refused commit left no manifest behind
    assert(Versioned.versions(spark, dir) == Seq(1, 2, 3))
  }
}
