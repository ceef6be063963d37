package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operator batch: binary diagnostics (MCC / balanced accuracy /
  * Youden), exact-numerator ECE, Cohen's d, confident-learning label
  * errors, cluster-aware splitting, and histogram-fed exact quantiles.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("binaryDiagnostics: hand case, exact cells, fixed-order statistics") {
    // tp=2 fp=1 fn=1 tn=3
    val d = Seq((1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0), (0, 0))
      .toDF("y", "p")
    val r = Eval.binaryDiagnostics(d, $"y" === 1, $"p" === 1)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert((r._1, r._2, r._3, r._4) == (2L, 1L, 1L, 3L))
    val mcc = (2.0 * 3.0 - 1.0 * 1.0) / math.sqrt(3.0 * 3.0 * 4.0 * 4.0)
    assert(math.abs(r._5 - mcc) < 1e-15, s"mcc ${r._5} != $mcc")
    val tpr = 2.0 / 3.0; val tnr = 3.0 / 4.0
    assert(math.abs(r._6 - (tpr + tnr) / 2.0) < 1e-15)
    assert(math.abs(r._7 - (tpr + tnr - 1.0)) < 1e-15)
    // a perfect classifier maxes every statistic
    val perfect = Eval.binaryDiagnostics(d, $"y" === 1, $"y" === 1)
      .select($"mcc", $"balanced_acc", $"youden_j")
      .as[(Double, Double, Double)].head()
    assert(perfect == ((1.0, 1.0, 1.0)))
    // single-class input gates MCC to NULL instead of dividing by zero
    val oneClass = Eval.binaryDiagnostics(
      Seq((1, 1), (1, 0)).toDF("y", "p"), $"y" === 1, $"p" === 1)
    assert(oneClass.select($"mcc").head().isNullAt(0))
  }

  test("expectedCalibrationError: telescoped numerator is exact; calibrated input scores 0") {
    // one bin [0,100): two rows at p=50 with one positive out of two would
    // need p=500; at p=0 with zero positives the bin is perfectly calibrated
    val perfect = Seq((0L, 0L), (0L, 0L), (1000L, 1L), (1000L, 1L))
      .toDF("p", "y")
    val r0 = Eval.expectedCalibrationError(perfect, $"p", $"y" === 1)
      .select($"ece_num", $"ece").as[(Long, Double)].head()
    assert(r0 == ((0L, 0.0)))
    // hand case: bin 0 has p=0,y=1 → |1000·1 − 0| = 1000; n=2
    val off = Seq((0L, 1L), (900L, 1L)).toDF("p", "y")
    val r1 = Eval.expectedCalibrationError(off, $"p", $"y" === 1)
      .select($"n", $"ece_num", $"ece").as[(Long, Long, Double)].head()
    // bin 9: |1000·1 − 900| = 100 → total 1100 over 2000
    assert(r1 == ((2L, 1100L, 1100.0 / 2000.0)))
  }

  test("cohensD: known two-group case and degenerate gates") {
    // treat {10,20,30} (mean 20, var 100), control {0,10,20} (mean 10, var 100)
    val d = Seq((10L, 1), (20L, 1), (30L, 1), (0L, 0), (10L, 0), (20L, 0))
      .toDF("x", "t")
    val r = Eval.cohensD(d, $"x", $"t" === 1)
      .select($"n1", $"n0", $"d").as[(Long, Long, Double)].head()
    assert(r._1 == 3L && r._2 == 3L)
    assert(math.abs(r._3 - 1.0) < 1e-12, s"d = ${r._3}, expected 1.0")
    // constant groups (zero pooled variance) gate to NULL
    val flat = Seq((5L, 1), (5L, 1), (5L, 0), (5L, 0)).toDF("x", "t")
    assert(Eval.cohensD(flat, $"x", $"t" === 1).select($"d").head().isNullAt(0))
  }

  test("confidentLabelErrors: planted contradictions are flagged, consistent rows are not") {
    // label-1 rows confident (p=900), label-0 rows confident (p=100),
    // plus one planted mislabel each way
    val rows = Seq.fill(10)((900L, 1L)) ++ Seq.fill(10)((100L, 0L)) ++
      Seq((950L, 0L)) ++ Seq((50L, 1L))
    val r = Eval.confidentLabelErrors(rows.toDF("p", "y"), $"p", $"y" === 1)
      .select($"c01", $"c10", $"n").as[(Long, Long, Long)].head()
    // thresholds: t1 = mean p among label-1 ≈ (9000+50)/11 ≈ 822 → the
    // planted 950 label-0 row crosses it; t0 on q=1000−p ≈ (9000+50)/11 →
    // the planted 50 label-1 row (q=950) crosses
    assert(r._1 == 1L, s"expected exactly the planted missing-positive, got ${r._1}")
    assert(r._2 == 1L, s"expected exactly the planted false-positive, got ${r._2}")
    assert(r._3 == 22L)
  }

  test("clusterAwareSplit: a cluster never straddles; assignment is component-keyed") {
    val docs = (0L until 300L).map(i => (i, i % 40)).toDF("doc_id", "component")
    val lab = graft.text.Curation.clusterAwareSplit(docs)
    val perCluster = lab.groupBy($"component")
      .agg(countDistinct($"split").as("k"))
      .agg(max($"k")).as[Long].head()
    assert(perCluster == 1L, "cluster-aware split must never straddle a cluster")
    // stateless projection: no exchange in the plan
    val plan = lab.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
    // docs of the same component get the SAME split even across partitionings
    val again = graft.text.Curation.clusterAwareSplit(docs.repartition(7))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val base = lab.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == base)
  }

  test("averagePrecision: hand case on the 2^30 grid; only the bucket-frame window is global") {
    // scores desc: 30(y=1), 20(y=0), 10(y=1) → prec terms 1/1, skip, 2/3
    val d = Seq((30L, 1), (20L, 0), (10L, 1)).toDF("s", "y")
    val r = Eval.averagePrecision(d, $"s", $"y" === 1)
      .select($"n_pos", $"n_neg", $"average_precision")
      .as[(Long, Long, Double)].head()
    assert(r._1 == 2L && r._2 == 1L)
    val expected = (1.0 + math.round(math.pow(2, 30) * 2.0 / 3.0) / math.pow(2, 30)) / 2.0
    assert(math.abs(r._3 - expected) < 1e-12, s"ap ${r._3} != $expected")
    // a perfect ranking scores 1.0 exactly (every prefix precision is 1)
    val perfect = Eval.averagePrecision(
      Seq((30L, 1), (20L, 1), (10L, 0)).toDF("s", "y"), $"s", $"y" === 1)
      .select($"average_precision").as[Double].head()
    assert(perfect == 1.0)
    // plan: the only global window rides the bucket-aggregate frame
    val big = (1 to 400).map(i => (i.toLong * 17 % 509, i % 4 == 0)).toDF("s", "y")
    val out = Eval.averagePrecision(big, $"s", $"y")
    val globals = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.size == 1, "exactly the bucket-frame window may be global")
    assert(globals.head.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "the global window must sit above the bucket histogram")
  }

  test("quantile-kernel compositions: Bowley 0 on uniform, trimmed mean 50.5 on 1..100") {
    val vals = (1L to 100L).toDF("cents")
    // quartiles of 1..100 are 25/50/75: Bowley = (75+25-100)/50 = 0
    val q = Quantiles.exactQuantilesTwoPass(vals, "cents", Seq(250, 500, 750), 10L)
      .collect().map(r => r.getAs[Long]("value_cents")).sorted
    assert(q.sameElements(Array(25L, 50L, 75L)))
    // trimmed ranks 11..90 sum to 4040, mean 50.5 — the rank identity path
    val lo = Quantiles.exactOrderStatistic(vals, "cents",
      n => org.apache.spark.sql.functions.expr("(n * 100 + 999) div 1000"), 10L)
      .head().getAs[Long]("value_cents")
    val hi = Quantiles.exactOrderStatistic(vals, "cents",
      n => org.apache.spark.sql.functions.expr("(n * 900 + 999) div 1000"), 10L)
      .head().getAs[Long]("value_cents")
    assert(lo == 10L && hi == 90L)
    val trimmedSum = (11L to 90L).sum
    assert(trimmedSum == 4040L && trimmedSum.toDouble / 80.0 == 50.5)
  }

  test("exactOrderStatistic: arbitrary rank rule selects the exact k-th value") {
    val vals = (1L to 500L).map(v => v * 13L % 997L)
    val df = vals.toDF("cents")
    val sorted = vals.sorted
    // conformal rank ⌈(n+1)·0.9⌉ at n=500 → k=451
    val r = Quantiles.exactOrderStatistic(df, "cents",
        n => expr("((n + 1) * 9 + 9) div 10"), bucketWidth = 50L)
      .as[(Long, Long, Long)].head()
    assert(r._1 == 500L && r._2 == 451L)
    assert(r._3 == sorted(450), s"k-th value ${r._3} != ${sorted(450)}")
    // a fixed-rank rule (median) agrees with the sorted list too
    val med = Quantiles.exactOrderStatistic(df, "cents",
        n => expr("(n + 1) div 2"), bucketWidth = 50L)
      .as[(Long, Long, Long)].head()
    assert(med._3 == sorted(249))
  }

  test("exactQuantilesFromHistogram: delta-merged histogram ≡ from-scratch") {
    val all = (1L to 1000L).map(v => v * 7L % 5000L).toDF("cents")
    val v1 = all.filter($"cents" % 10 =!= 0)
    val delta = all.filter($"cents" % 10 === 0)
    def hist(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("bucket", expr("cents div 100"))
      .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
    val merged = hist(v1).unionByName(hist(delta))
      .groupBy($"bucket").agg(sum($"cnt").as("cnt"))
    val inc = Quantiles.exactQuantilesFromHistogram(
        merged, all, "cents", Seq(250, 500, 900), 100L)
      .orderBy($"p").collect().toSeq
    val scratch = Quantiles.exactQuantilesTwoPass(
        all, "cents", Seq(250, 500, 900), 100L)
      .orderBy($"p").collect().toSeq
    assert(inc == scratch, "delta-maintained pass 1 must equal the rebuild")
  }
}
