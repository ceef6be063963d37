package graft.maintain

import graft.SparkSpec
import graft.queries.TelematicsQueries
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/fact"
    Layout.writeFact(TelematicsQueries.normalizedFact(spark, sf()), d)
    d
  }

  test("fact layout: partition dirs, zstd files, sorted within files") {
    val buckets = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("device_id_bucket=")).map(_.getName)
    assert(buckets.nonEmpty)
    val days = new java.io.File(s"$dir/${buckets.head}").listFiles()
      .filter(_.getName.startsWith("received_day=")).map(_.getName)
    assert(days.nonEmpty)
    val files = new java.io.File(s"$dir/${buckets.head}/${days.head}")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains(".zstd.")))
    // sorted within each file: per-partition rows are non-decreasing
    val sortedOk = spark.read.parquet(s"$dir/${buckets.head}/${days.head}")
      .select($"device_id", unix_micros($"gps_epoch").as("t"))
      .as[(String, Long)].collect()
    assert(sortedOk.sliding(2).forall {
      case Array((d1, t1), (d2, t2)) => d1 < d2 || (d1 == d2 && t1 <= t2)
      case _ => true
    })
  }

  test("point lookup on the layout prunes partitions in the scan") {
    val df = spark.read.parquet(dir)
      .filter($"received_day" === lit("2024-01-10").cast("date") &&
        $"device_id_bucket" === math.abs("7".hashCode) % 32 &&
        $"device_id" === "7")
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), planStr)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val pruned = scan.toString
    assert(pruned.contains("received_day") && pruned.contains("device_id_bucket"),
      s"partition filters missing from scan: $pruned")
    // pushed data filter on device_id reaches the parquet reader
    assert(pruned.contains("PushedFilters") && pruned.contains("EqualTo(device_id,7)"),
      pruned)
    assert(df.count() > 0)
  }

  test("co-bucketed tables join and aggregate with zero Exchange") {
    val o = graft.Tables.orders(spark, sf()).select($"o_orderkey", $"o_totalprice")
    val l = graft.Tables.lineitem(spark, sf())
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    // the in-memory catalog is fresh per JVM but the warehouse dir persists:
    // clear stale locations from prior runs before CTAS
    Seq("bkt_orders", "bkt_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Layout.writeBucketed(o, "bkt_orders", "o_orderkey", buckets = 8,
      sortCols = Seq("o_orderkey"))
    Layout.writeBucketed(l, "bkt_lineitem", "o_orderkey", buckets = 8,
      sortCols = Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("qty"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join + agg must not shuffle:\n$p")
      // and it computes the same result as the un-bucketed join
      val expected = o.join(l, "o_orderkey").groupBy($"o_orderkey")
        .agg(sum($"l_quantity").as("qty"))
        .as[(Long, Double)].collect().toMap
      assert(j.as[(Long, Double)].collect().toMap == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("materialized posting probe: bucket-pruned scan, one Exchange, matches corpus search") {
    import graft.text.TextAnalysis
    val docs = graft.Tables.documents(spark, sf())
    val table = TextAnalysis.materializePostings(docs, key = sf() + "#spec",
      buckets = 8, chunkSize = 64)
    val probe = TextAnalysis.searchPostings(spark, table, Seq("data", "query", "table"))
    val p = probe.queryExecution.executedPlan.toString
    // the isin on the bucketing column prunes to the queried terms' buckets
    assert(p.contains("SelectedBucketsCount"), s"no bucket pruning:\n$p")
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r
    assert(sel.findFirstMatchIn(p).exists(_.group(1).toInt < 8),
      s"probe read all buckets:\n$p")
    // probe side shuffle-free: the only Exchange is the post-probe agg on
    // doc_id (matched postings only, never corpus-sized)
    assert("Exchange".r.findAllIn(p).size <= 2, s"probe plan over-shuffles:\n$p")
    // identical result to the raw-corpus search
    val got = probe.as[(Long, Long)].collect().toSet
    val ref = TextAnalysis.searchAll(docs, Seq("data", "query", "table"))
      .as[(Long, Long)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("geohash matches published reference hashes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // well-known reference values (geohash.org): Jutland peninsula point,
    // White House, Sydney Opera House, null island, and the lower corner
    val pts = Seq(
      (57.64911, 10.40744, "u4pruy"),
      (38.89770, -77.03653, "dqcjqc"),
      (-33.85678, 151.21528, "r3gx2u"),
      (0.0, 0.0, "s00000"),
      (-90.0, -180.0, "000000"))
    val out = pts.toDF("lat", "lon", "expected")
      .withColumn("gh", Layout.geohash(col("lat"), col("lon"), 6))
      .select($"gh", $"expected").as[(String, String)].collect()
    out.foreach { case (gh, exp) => assert(gh == exp, s"got $gh want $exp") }
  }

  test("as-of and range joins avoid nested-loop plans") {
    import graft.analytics.{AsOfJoin, RangeJoin}
    val scores = graft.score.RiskScore.pipeline(TelematicsQueries.normalizedFact(spark, sf()))
      .select($"device_id", $"report_date", $"level")
    val ev = TelematicsQueries.normalizedFact(spark, sf())
      .select($"device_id", to_date($"gps_epoch").as("event_date"))
    val asof = AsOfJoin.asOfJoin(ev, scores, Seq("device_id"),
      col("event_date"), col("report_date"))
    assert(!asof.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "as-of join planned as nested loop")
    val pts = Seq((1L, 5L)).toDF("event_id", "pt")
    val ivs = Seq((1L, 0L, 10L)).toDF("interval_id", "lo", "hi")
    val rj = RangeJoin.pointInInterval(pts, ivs, "pt", "lo", "hi", 4L)
    assert(!rj.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "range join planned as nested loop")
  }
  test("evolved partition layouts both prune on the lang predicate") {
    val docs = graft.Tables.documents(spark, sf())
    val tmp = java.nio.file.Files.createTempDirectory("graft_evo_spec_").toString
    docs.filter($"doc_id" % 2 === 0).write.partitionBy("lang").parquet(s"$tmp/v1")
    docs.filter($"doc_id" % 2 === 1)
      .write.partitionBy("lang", "source").parquet(s"$tmp/v2")
    def partFilters(df: org.apache.spark.sql.DataFrame): String = {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan)
      plan.split("PartitionFilters: \\[")(1).split("]")(0)
    }
    val v1 = spark.read.parquet(s"$tmp/v1").filter($"lang" === "en")
    val v2 = spark.read.parquet(s"$tmp/v2").filter($"lang" === "en")
    // the lang predicate must reach the partition filter (directory pruning),
    // not the data filter, in BOTH layout generations
    assert(partFilters(v1).contains("lang"), "v1 scan does not prune on lang")
    assert(partFilters(v2).contains("lang"), "v2 scan does not prune on lang")
    val n = v1.count() + v2.count()
    assert(n == docs.filter($"lang" === "en").count())
  }
  test("zValue3 interleaves disjoint bit positions; bits bound enforced") {
    import graft.maintain.Layout
    val df = Seq((1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 3, 3)).toDF("x", "y", "z")
    val out = df.select(Layout.zValue3($"x", $"y", $"z", bits = 4).as("v"))
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 4L, 7L * 8 + 7L)) // (3,3,3) -> 0b111111 = 63
    intercept[IllegalArgumentException] {
      Layout.zValue3($"x", $"y", $"z", bits = 22)
    }
    ()
  }

  test("hilbert: bijective on the grid, unit-step curve, beats z-order locality") {
    import graft.maintain.Layout
    val n = 16 // bits = 4, exhaustive 256-cell grid
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
    val cells = Layout.withHilbert(grid, "x", "y", bits = 4)
      .select($"h", $"x", $"y").as[(Long, Int, Int)].collect().sortBy(_._1)
    // bijection onto [0, n²)
    assert(cells.map(_._1).toSeq == (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property: every consecutive pair of curve positions is
    // Manhattan-adjacent — no jumps, ever
    val steps = cells.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(steps.forall(_ == 1))
    // the z-curve on the same grid jumps at power-of-two seams
    val zcells = grid.select(Layout.zValue($"x", $"y", 4).as("z"), $"x", $"y")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    val zJumps = zcells.sliding(2).count { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0)
    // first quadrant-order sanity: the 2x2 curve is (0,0)->(0,1)->(1,1)->(1,0)
    val tiny = Layout.withHilbert(
        Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("x", "y"), "x", "y", bits = 1)
      .select($"h", $"x", $"y").as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(tiny.map(t => (t._2, t._3)).toSeq == Seq((0, 0), (0, 1), (1, 1), (1, 0)))
  }
}
