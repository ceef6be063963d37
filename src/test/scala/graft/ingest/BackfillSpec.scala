package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BackfillSpec extends SparkSpec {
  import spark.implicits._

  test("pushdown subquery carries every predicate to the database") {
    val q = Backfill.pushdownSubquery("telematics", Seq("STATUS", "ALERT"),
      1700000000L, 1700086400L, Seq("d1", "d2"))
    assert(q.contains("report_type IN ('STATUS', 'ALERT')"))
    assert(q.contains("received_epoch >= 1700000000 AND received_epoch < 1700086400"))
    assert(q.contains("device_id IN ('d1', 'd2')"))
    assert(q.trim.startsWith("(SELECT") && q.trim.endsWith("AS src"))
  }

  test("pushdown subquery escapes embedded quotes (sql_str_list parity)") {
    val q = Backfill.pushdownSubquery("telematics", Seq("O'NEIL"),
      0L, 1L, Seq("d'; DROP TABLE telematics; --"))
    assert(q.contains("report_type IN ('O''NEIL')"))
    assert(q.contains("device_id IN ('d''; DROP TABLE telematics; --')"))
  }

  test("chunk loop isolates per-chunk failures and reports counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bf").toString + "/out"
    def source(chunk: Seq[String]): DataFrame = {
      if (chunk.contains("dBAD")) throw new RuntimeException("connection reset")
      chunk.map(d => (d, s"($d,7.5)")).toDF("device_id", "point")
    }
    val results = Backfill.run(Seq("d1", "d2", "d3", "dBAD", "d5"), 2)(source)(
      df => Backfill.parsePoint(df, "point"))(
      df => df.write.mode("append").parquet(dir))
    assert(results.map(_.rows) == Seq(2L, 0L, 1L)) // [d1,d2], [d3,dBAD]→fail, [d5]
    assert(results(1).error.isDefined && results(2).error.isEmpty)
    val written = spark.read.parquet(dir)
    assert(written.count() == 3) // failed chunk contributed nothing
    assert(written.filter($"latitude" === 7.5).count() == 3)
  }

  test("parsePoint tolerates malformed coordinates (FIXTURES.md §3)") {
    val out = Backfill.parsePoint(
        Seq("(-99.1,19.4)", "missing paren", "", null, "(1.0)").toDF("point"), "point")
      .select("longitude", "latitude").collect()
    assert(out(0).getDouble(0) == -99.1 && out(0).getDouble(1) == 19.4)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // "missing paren" → no numeric
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    assert(out(3).isNullAt(0) && out(3).isNullAt(1))
    assert(out(4).getDouble(0) == 1.0 && out(4).isNullAt(1)) // lat missing
  }
}
