package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  test("herfindahl: monopoly -> 1; equal shares -> 1/k, normalized 0") {
    val mono = Seq((1L, 100L), (1L, 50L)).toDF("key", "cents")
    val r1 = Inequality.herfindahl(mono, "key", "cents").head()
    assert(r1.getAs[Long]("k") == 1L)
    assert(math.abs(r1.getAs[Double]("hhi") - 1.0) < 1e-15)
    val eq = Seq((1L, 50L), (2L, 50L), (3L, 50L), (4L, 50L)).toDF("key", "cents")
    val r2 = Inequality.herfindahl(eq, "key", "cents").head()
    assert(math.abs(r2.getAs[Double]("hhi") - 0.25) < 1e-15)
    assert(math.abs(r2.getAs[Double]("hhi_norm")) < 1e-15)
  }

  test("theilDecomposition: perfect equality -> all terms ~0; zero rows dropped") {
    val df = Seq((1L, 100L), (1L, 100L), (2L, 100L), (2L, 100L), (2L, 0L))
      .toDF("grp", "x")
    val r = Inequality.theilDecomposition(df, "grp", "x").head()
    assert(r.getAs[Long]("n_dropped") == 1L)
    // equal positive amounts: ln ratios are exactly ln 1 = 0 -> micro-nat
    // floor is 0 -> exact zero total/within; between is 0 up to fp
    assert(r.getAs[Double]("theil_total") == 0.0)
    assert(r.getAs[Double]("theil_within") == 0.0)
    assert(math.abs(r.getAs[Double]("theil_between")) < 1e-15)
  }

  test("theilDecomposition: between-group concentration shows in the split") {
    // group 1 holds 4x the per-capita amount of group 2
    val df = Seq((1L, 400L), (1L, 400L), (2L, 100L), (2L, 100L)).toDF("grp", "x")
    val r = Inequality.theilDecomposition(df, "grp", "x").head()
    assert(r.getAs[Double]("theil_between") > 0.1)
    assert(math.abs(r.getAs[Double]("theil_within")) < 1e-6)
    // total ~ between + within under micro-nat quantization
    assert(math.abs(r.getAs[Double]("theil_total") -
      (r.getAs[Double]("theil_between") + r.getAs[Double]("theil_within"))) < 1e-4)
  }

  test("psi: identical cohorts 0/stable; disjoint cohorts skip-counted") {
    val same = Seq((10L, true), (10L, false), (60L, true), (60L, false))
      .toDF("v", "a")
    val r1 = Drift.psi(same, "v", col("a"), 50L, 4).head()
    assert(r1.getAs[Double]("psi") == 0.0)
    assert(r1.getAs[String]("band") == "stable")
    val disj = Seq((10L, true), (60L, false)).toDF("v", "a")
    val r2 = Drift.psi(disj, "v", col("a"), 50L, 4).head()
    assert(r2.getAs[Long]("n_skipped_buckets") == 2L)
    assert(r2.getAs[Double]("psi") == 0.0)
  }
}
