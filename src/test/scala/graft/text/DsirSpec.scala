package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b", "tgt"),   // bigrams: "a b" ×2, "b a"
    (2L, "x y", "raw"),       // "x y"
    (3L, "a b c", "raw"),     // "a b", "b c"
    (4L, "solo", "raw")       // no bigram
  ).toDF("doc_id", "text", "source")

  test("bucket weights follow the power-of-two log-ratio formula") {
    val w = Dsir.bucketWeights(docs, "tgt").collect()
    // formula consistency on every bucket: w = bitlen(tgt+1) - bitlen(raw+1)
    w.foreach { r =>
      val (t, raw, wt) = (r.getAs[Long]("tgt_cnt"), r.getAs[Long]("raw_cnt"),
        r.getAs[Long]("weight"))
      def bitlen(n: Long) = 64 - java.lang.Long.numberOfLeadingZeros(n)
      assert(wt == bitlen(t + 1) - bitlen(raw + 1), s"bucket row $r")
    }
    // the planted bigrams hash to distinct buckets (fixed md5 values):
    // "a b" → (tgt 2, raw 1, w 0), "b a" → (1, 0, +1), "x y"/"b c" → (0, 1, −1)
    val byCounts = w.map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(byCounts((2L, 1L)) == 0L)
    assert(byCounts((1L, 0L)) == 1L)
    assert(byCounts((0L, 1L)) == -1L)
  }

  test("doc scores: target-like docs score higher; bigram-less docs score zero") {
    val s = Dsir.docScores(docs, "tgt").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"), r.getAs[Long]("score"))).toMap
    assert(s(1L) == (3L, 1L), "target doc: w(a b)+w(a b)+w(b a) = 0+0+1")
    assert(s(2L) == (1L, -1L))
    assert(s(3L) == (2L, -1L), "a b (0) + b c (−1)")
    assert(s(4L) == (0L, 0L), "single-token doc survives with zero score")
  }

  test("scores are partitioning-invariant") {
    val a = Dsir.docScores(docs, "tgt").orderBy("doc_id").collect().toSeq
    val b = Dsir.docScores(docs.repartition(7), "tgt").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("weight table stays bucket-bounded and broadcastable") {
    val big = graft.Tables.documents(spark, sf())
    val w = Dsir.bucketWeights(big, "src0", buckets = 64)
    assert(w.count() <= 64)
    val p = Dsir.docScores(big, "src0").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"weights must broadcast back:\n$p")
  }
}
