package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  test("nearestControl: hand case — picks the closer side, prev on ties, NULL without controls") {
    val df = Seq(
      // stratum A: controls at 10 and 40; treated at 20 (closer to 10) and 35 (closer to 40)
      ("A", 1L, 10L, false), ("A", 2L, 20L, true),
      ("A", 3L, 35L, true), ("A", 4L, 40L, false),
      // stratum B: treated equidistant between controls at 10 and 30 → prev wins
      ("B", 5L, 10L, false), ("B", 6L, 20L, true), ("B", 7L, 30L, false),
      // stratum C: no controls at all
      ("C", 8L, 99L, true),
      // stratum D: control on ONE side only (the edge case where a bare
      // least(pd, nd) diverges between engines — Spark ignores the NULL
      // side, SQL propagates it; match_dist is now an explicit CASE)
      ("D", 9L, 10L, true), ("D", 10L, 25L, false),
      ("D", 11L, 50L, true))
      .toDF("st", "id", "v", "t")
    val r = Matching.nearestControl(df, $"st", $"id", $"v", $"t")
      .select($"id", $"control_id", $"match_dist")
      .as[(Long, Option[Long], Option[Long])].collect().map(x => x._1 -> x).toMap
    assert(r(2L) === ((2L, Some(1L), Some(10L))))
    assert(r(3L) === ((3L, Some(4L), Some(5L))))
    assert(r(6L) === ((6L, Some(5L), Some(10L))), "tie must break to the prev control")
    assert(r(8L) === ((8L, None, None)))
    assert(r(9L) === ((9L, Some(10L), Some(15L))), "next-only edge unit matches forward")
    assert(r(11L) === ((11L, Some(10L), Some(25L))), "prev-only edge unit matches backward")
  }

  test("nearestControl: window plan equals the brute-force nearest pair join") {
    val df = (1 to 200).map { i =>
      (s"S${i % 3}", i.toLong, (i.toLong * 37 % 211) * 10 + i % 7, i % 4 == 0)
    }.toDF("st", "id", "v", "t")
    val fast = Matching.nearestControl(df, $"st", $"id", $"v", $"t")
      .select($"id", $"match_dist").as[(Long, Long)].collect().toMap
    val treated = df.filter($"t").select($"st", $"id", $"v")
    val controls = df.filter(!$"t").select($"st", $"v".as("cv"))
    val brute = treated.join(controls, Seq("st"))
      .groupBy($"id").agg(min(abs($"v" - $"cv")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(fast === brute, "1-D window matching must be the exact nearest neighbor")
  }

  test("nearestControl: partitioning-invariant") {
    val df = (1 to 100).map(i => ("S", i.toLong, (i * 13 % 97).toLong, i % 3 == 0))
      .toDF("st", "id", "v", "t")
    val a = Matching.nearestControl(df, $"st", $"id", $"v", $"t")
      .collect().map(_.toString).sorted.toSeq
    val b = Matching.nearestControl(df.repartition(7), $"st", $"id", $"v", $"t")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
