package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSampleSpec extends SparkSpec {
  import spark.implicits._

  private def positives = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 13L),
    (3L, 14L)
  ).toDF("user_id", "item")

  private def catalog = (10L to 29L).toDF("item_id")

  test("negatives are never positives, at most k per user, ordered by probe index") {
    val neg = Sampling.negativeSample(positives, catalog, k = 3, probes = 12)
    val rows = neg.collect()
    val pos = positives.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!pos.contains((r.getLong(0), r.getLong(1))),
        s"positive leaked into negatives: $r")
    }
    val perUser = rows.groupBy(_.getLong(0))
    assert(perUser.values.forall(_.length <= 3))
    perUser.values.foreach { rs =>
      val idx = rs.map(_.getInt(2)).sorted
      assert(idx.distinct.length == idx.length, "duplicate probe index")
    }
    // catalog membership
    val cat = catalog.collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(cat.contains(r.getLong(1))))
  }

  test("deterministic across reruns and partitionings; seed redraws") {
    val a = Sampling.negativeSample(positives, catalog).orderBy("user_id", "probe_idx")
      .collect().toSeq
    val b = Sampling.negativeSample(positives.repartition(5), catalog.repartition(3))
      .orderBy("user_id", "probe_idx").collect().toSeq
    assert(a == b, "same draw on any partitioning")
    val c = Sampling.negativeSample(positives, catalog, seed = "other")
      .orderBy("user_id", "probe_idx").collect().toSeq
    assert(a != c, "different seed must redraw")
  }

  test("plan: catalog stats are a 1-row broadcast, no cartesian product") {
    val p = Sampling.negativeSample(positives, catalog)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("Broadcast"), s"stats must broadcast:\n$p")
  }
}
