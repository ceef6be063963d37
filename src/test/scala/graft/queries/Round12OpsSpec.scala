package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-12 registry additions, beyond the oracle
  * hash: the dedup-threshold sweep's internal consistency and the
  * late-data stream's no-leak guarantees.
  */
class Round12OpsSpec extends SparkSpec {

  test("q_dedup_sweep: monotone in the threshold, base point = pair table") {
    val dir = sf()
    val rows = graft.SparkEntry.queries("q_dedup_sweep")(spark, dir)
      .orderBy(col("threshold_permille"))
      .select(col("threshold_permille"), col("n_pairs"), col("n_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(500L, 600L, 700L, 800L, 900L))
    // tightening the threshold can only DROP pairs and docs
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3,
        s"sweep must be monotone non-increasing: $lo -> $hi")
    }
    // the 0.5 operating point IS the materialized pair table
    val base = spark.read.parquet(PipelineQueries.dupPairsParquet(spark, dir))
    assert(rows.head._2 == base.count(),
      "t=0.5 row must equal the full near-dup pair table")
    // planted exact copies guarantee survivors at the tightest cut
    assert(rows.last._2 > 0L, "planted exact dups must survive t=0.9")
  }

  test("q_stream_late: late rows never leak through the restart, run is deterministic") {
    val dir = sf()
    val out = graft.SparkEntry.queries("q_stream_late")(spark, dir)
      .select(col("window_start"), col("n")).collect()
    assert(out.nonEmpty, "watermark must have closed at least one window")
    // the late half lives ~3650 days in the past: ANY pre-2020 window in
    // the sink means late data leaked through the restored watermark
    val leaked = out.count(_.getTimestamp(0)
      .before(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
    assert(leaked == 0, s"$leaked late windows leaked into the append sink")
    // emitted windows are exactly the on-time ones the watermark passed
    val a = graft.Tables.events(spark, dir)
      .filter(col("event_id") % 2 === 0)
      .select(col("ts").cast("timestamp").as("ts"))
    val cutoff = a.agg((max(col("ts")).cast("long") - lit(3L * 86400L))
      .as("w")).head().getLong(0)
    val expected = a
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .filter(col("w.end").cast("long") <= cutoff)
      .count()
    assert(out.length.toLong == expected,
      s"emitted ${out.length} windows, watermark arithmetic expects $expected")
    // order is imposed by the two sequential runs, so a repeat must agree
    val again = graft.SparkEntry.queries("q_stream_late")(spark, dir)
      .select(col("window_start"), col("n")).collect()
    assert(again.map(r => (r.getTimestamp(0), r.getLong(1))).toSet ==
      out.map(r => (r.getTimestamp(0), r.getLong(1))).toSet)
  }
}
