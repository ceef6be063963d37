package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 contracts on the rank-statistics family: the ENFORCED
  * bounded-group guard on the exact quadratic operators, the sampled-pair
  * τ estimator that replaces them past the bound, and the documented
  * Σx⁴ overflow envelope of [[Correlation.moments]].
  */
class CorrelationBoundSpec extends SparkSpec {
  import spark.implicits._

  private def noisy(n: Int): Seq[(String, Long, Long, Long)] =
    (1 to n).map { i =>
      // mostly-increasing y with deterministic noise → τ strictly in (0, 1)
      val y = i.toLong + (if (i % 3 == 0) 7L else 0L) - (if (i % 5 == 0) 9L else 0L)
      ("g", i.toLong, y, i.toLong)
    }

  test("kendallTau / theilSen refuse a group over the declared bound, loudly") {
    val df = noisy(50).toDF("grp", "x", "y", "id")
    val ex = intercept[Throwable] {
      Correlation.kendallTau(df, "grp", "x", "y", "id", maxGroupSize = 10).collect()
    }
    assert(ex.getMessage.contains("exceeding the declared bound 10"),
      s"guard must name the bound, got: ${ex.getMessage}")
    val ex2 = intercept[Throwable] {
      Correlation.theilSen(df, "grp", "x", "y", maxGroupSize = 10).collect()
    }
    assert(ex2.getMessage.contains("theilSen"))
    // within the bound: identical results with and without a tight bound
    val loose = Correlation.kendallTau(df, "grp", "x", "y", "id").collect().toSeq
    val tight = Correlation.kendallTau(df, "grp", "x", "y", "id",
      maxGroupSize = 50).collect().toSeq
    assert(loose == tight)
  }

  test("kendallTauSampled: exact on monotone groups, converges on noisy data") {
    val up = (1 to 200).map(i => ("up", i.toLong, i.toLong * 2, i.toLong))
    val down = (1 to 200).map(i => ("down", i.toLong, -i.toLong, i.toLong))
    val df = (up ++ down).toDF("grp", "x", "y", "id")
    val est = Correlation.kendallTauSampled(df, "grp", "x", "y", "id",
      pairsPerGroup = 300)
      .select("grp", "tau_a_est").as[(String, Double)].collect().toMap
    assert(est("up") == 1.0 && est("down") == -1.0,
      s"monotone groups must sample to ±1 exactly, got $est")
    // noisy group: the m-pair estimate lands near the exact τ
    val nf = noisy(400).toDF("grp", "x", "y", "id")
    val exact = Correlation.kendallTau(nf, "grp", "x", "y", "id")
      .select("tau_a").as[Double].head()
    val sampled = Correlation.kendallTauSampled(nf, "grp", "x", "y", "id",
      pairsPerGroup = 2000).select("tau_a_est").as[Double].head()
    assert(math.abs(sampled - exact) < 0.05,
      s"sampled τ̂=$sampled too far from exact τ=$exact")
    // deterministic and partitioning-invariant
    val again = Correlation.kendallTauSampled(nf.repartition(7), "grp", "x", "y",
      "id", pairsPerGroup = 2000).select("tau_a_est").as[Double].head()
    assert(again == sampled)
    // draw count: exactly m pairs per group with ≥2 rows; singleton skipped
    val single = (noisy(50) :+ (("lone", 1L, 1L, 99L))).toDF("grp", "x", "y", "id")
    val np = Correlation.kendallTauSampled(single, "grp", "x", "y", "id",
      pairsPerGroup = 64).select("grp", "n_pairs").as[(String, Long)].collect().toMap
    assert(np == Map("g" -> 64L))
  }

  test("moments: documented Σx⁴ envelope — edge passes, over-bound fails loudly (ANSI), momentsWide survives") {
    // n = 9·10⁶ at |x| = 10³: Σx⁴ = 9·10¹⁸ < 2⁶³−1 ≈ 9.22·10¹⁸ — the edge
    val edge = spark.range(9000000L)
      .select(lit("g").as("g"), lit(1000L).as("x"))
    val ok = Correlation.moments(edge, "g", "x").collect()
    assert(ok.head.getAs[Long]("s4") == 9000000000000000000L)
    // one more order of magnitude breaks the envelope: ANSI throws instead
    // of wrapping — the documented loud failure
    val over = spark.range(10000000L)
      .select(lit("g").as("g"), lit(1000L).as("x"))
    val ex = intercept[Throwable] {
      Correlation.moments(over, "g", "x").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("overflow"),
      s"expected ARITHMETIC_OVERFLOW, got: ${ex.getMessage}")
    // the DECIMAL(38) fallback clears the same input exactly
    val wide = Correlation.momentsWide(over, "g", "x").collect().head
    assert(wide.getAs[java.math.BigDecimal]("s4")
      .compareTo(new java.math.BigDecimal("10000000000000000000")) == 0) // 10¹⁹
    assert(wide.getAs[Double]("mean") == 1000.0 &&
      wide.getAs[Double]("variance") == 0.0)
    // agreement with the narrow path inside the envelope
    val small = Seq(("a", 1L), ("a", 2L), ("a", 5L), ("a", 9L), ("b", 4L))
      .toDF("g", "x")
    val narrow = Correlation.moments(small, "g", "x")
      .select("g", "mean", "variance", "skewness", "kurtosis")
      .orderBy("g").collect().toSeq
    val asWide = Correlation.momentsWide(small, "g", "x")
      .select("g", "mean", "variance", "skewness", "kurtosis")
      .orderBy("g").collect().toSeq
    assert(narrow.toString == asWide.toString)
  }
}
