package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 operator contracts: the incremental pHash band index
  * (`q_phash_incremental`, the 7th delta-maintenance family member).
  */
class Round15OpsSpec extends SparkSpec {

  private lazy val out =
    graft.SparkEntry.queries("q_phash_incremental")(spark, sf())
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getBoolean(6))))
      .toMap

  /** Fresh gated hashes, independent of the memoized fixtures. */
  private def hashes = graft.multimodal.Multimodal.imageDHash(spark,
      graft.Tables.cachedParquet(spark,
          PipelineQueries.pngMediaParquet(spark, sf()))
        .filter(col("doc_id") % 16 + 1 >= 10 && col("doc_id") % 12 + 1 >= 8))
    .toDF().filter(col("decoded"))
    .select(col("doc_id"), col("hash_hi"), col("hash_lo"))

  test("every row carries the rebuild-equality proof bit") {
    assert(out.nonEmpty)
    assert(out.values.forall(_._6), "inc_equals_rebuild must be TRUE on every row")
  }

  test("banded verdicts ≡ brute-force Hamming ≤ 3 (pigeonhole losslessness end-to-end)") {
    val hs = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val delta = hs.filter(_._1 % 7 == 0)
    val brute = delta.map { case (id, hi, lo) =>
      val matches = hs.filter { case (pid, phi, plo) =>
        pid != id &&
          (java.lang.Long.bitCount(hi ^ phi) + java.lang.Long.bitCount(lo ^ plo)) <= 3
      }
      val mv1 = matches.count(_._1 % 7 != 0).toLong
      val md = matches.count(_._1 % 7 == 0).toLong
      val minHam = if (matches.isEmpty) -1L
        else matches.map { case (_, phi, plo) =>
          (java.lang.Long.bitCount(hi ^ phi) + java.lang.Long.bitCount(lo ^ plo)).toLong
        }.min
      id -> ((mv1, md, minHam))
    }.toMap
    assert(out.keySet == brute.keySet,
      s"delta id set mismatch: ${(out.keySet diff brute.keySet).take(5)} / " +
        s"${(brute.keySet diff out.keySet).take(5)}")
    brute.foreach { case (id, (mv1, md, minHam)) =>
      val (_, qv1, qd, qmh, verdict, _) = out(id)
      assert(qv1 == mv1 && qd == md,
        s"doc $id: match split got ($qv1,$qd) want ($mv1,$md)")
      assert(qmh == minHam, s"doc $id: min_hamming got $qmh want $minHam")
      assert(verdict == (if (mv1 + md > 0) "near_dup" else "novel"),
        s"doc $id: verdict $verdict with matches ${mv1 + md}")
    }
    // the fixture must exercise both generations and both verdicts
    assert(brute.values.exists(_._1 > 0), "no v1 matches planted")
    assert(brute.values.exists(_._2 > 0), "no delta-internal matches planted")
    assert(brute.values.exists(v => v._1 + v._2 == 0), "no novel delta docs")
  }

  test("maintained index ≡ from-scratch rebuild, recomputed on fresh frames") {
    import graft.multimodal.Multimodal
    val h = hashes.localCheckpoint(true)
    val v1 = Multimodal.phashBands(h.filter(col("doc_id") % 7 =!= 0))
    val deltaB = Multimodal.phashBands(h.filter(col("doc_id") % 7 === 0))
    val maintained = v1.unionByName(deltaB)
    val rebuilt = Multimodal.phashBands(h)
    assert(maintained.exceptAll(rebuilt).isEmpty)
    assert(rebuilt.exceptAll(maintained).isEmpty)
  }
}
