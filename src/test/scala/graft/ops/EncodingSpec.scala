package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncodeLOO: hand case — own label excluded, singleton gated NULL") {
    val df = Seq((1L, "a", 1), (2L, "a", 0), (3L, "a", 1), (4L, "b", 0))
      .toDF("id", "cat", "lbl")
    val r = Encoding.targetEncodeLOO(df, $"cat", $"lbl" === 1)
      .select($"id", $"y", $"cat_cnt", $"enc_loo", $"prior")
      .as[(Long, Long, Long, Option[Double], Double)].collect()
      .map(x => x._1 -> x).toMap
    // cat a: sum=2, cnt=3 → row1 (y=1): (2-1)/2 = 0.5; row2 (y=0): 2/2 = 1.0
    assert(r(1L)._4.get === 0.5)
    assert(r(2L)._4.get === 1.0)
    assert(r(3L)._4.get === 0.5)
    assert(r(4L)._4.isEmpty, "singleton category has no leave-one-out mean")
    assert(r(1L)._5 === 0.5) // global prior 2/4
  }

  test("targetEncodeLOO: flipping one row's label never changes that row's own encoding bias direction") {
    // leakage check: row 1's encoding depends only on OTHER rows' labels
    val base = Seq((1L, "a", 0), (2L, "a", 1), (3L, "a", 0)).toDF("id", "cat", "lbl")
    val flipped = Seq((1L, "a", 1), (2L, "a", 1), (3L, "a", 0)).toDF("id", "cat", "lbl")
    def encOf(df: org.apache.spark.sql.DataFrame, id: Long) =
      Encoding.targetEncodeLOO(df, $"cat", $"lbl" === 1)
        .filter($"id" === id).select($"enc_loo").as[Double].head()
    // others of row 1 are rows 2,3 with labels (1,0) in BOTH frames
    assert(encOf(base, 1L) === encOf(flipped, 1L),
      "row 1's encoding must be a function of the other rows only")
  }

  test("featureHash: counts conserve tokens; signed sum parity-bounded; deterministic") {
    val docs = Seq((1L, "x y z x"), (2L, "x y z x")).toDF("doc_id", "text")
    val r = Encoding.featureHash(docs, "doc_id", "text", k = 16)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = r.groupBy(_._1)
    assert(byDoc(1L).map(_._3).sum === 4L, "slot counts must conserve the token count")
    r.foreach { case (_, _, cnt, ss) =>
      assert(math.abs(ss) <= cnt && (ss - cnt) % 2 === 0,
        s"signed sum must be a ±1 sum of cnt terms: ($cnt, $ss)") }
    assert(byDoc(1L).map(t => (t._2, t._3, t._4)).toSet ===
      byDoc(2L).map(t => (t._2, t._3, t._4)).toSet,
      "identical documents must hash identically")
  }
}
