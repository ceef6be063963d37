package graft.score

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

class RiskScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Rows: (device_id, gps_epoch UTC, speed_kmh). */
  private def fact(rows: Seq[(String, String, Double)]): DataFrame =
    rows.map { case (d, ts, v) => (d, Timestamp.valueOf(ts), v) }
      .toDF("device_id", "gps_epoch", "speed_kmh")

  private def run(rows: Seq[(String, String, Double)]) =
    RiskScore.pipeline(fact(rows)).collect().map(r =>
      (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("night window boundaries in Mexico_City local time (UTC-6)") {
    // local 22:59:59 / 23:00:00 / 03:59:59 / 04:00:00 = UTC +6h
    val rows = Seq(
      ("d", "2024-01-11 04:59:59.0", 50.0), // local Jan10 22:59:59 → not night
      ("d", "2024-01-11 05:00:00.0", 50.0), // local Jan10 23:00:00 → night
      ("d", "2024-01-11 09:59:59.0", 50.0), // local Jan11 03:59:59 → night
      ("d", "2024-01-11 10:00:00.0", 50.0)  // local Jan11 04:00:00 → not night
    )
    val out = run(rows).sortBy(_._2)
    assert(out.map(_._2) == Seq("2024-01-10", "2024-01-11")) // local dates = UTC-6
    assert(out.map(_._5) == Seq(2L, 2L)) // total per local day
    assert(out.map(_._7) == Seq(1L, 1L)) // one night report each side
  }

  test("score null-gated below 10 reports, present at 10") {
    def mk(n: Int, dev: String) =
      (0 until n).map(i => (dev, f"2024-01-10 12:00:$i%02d.0", 120.0))
    val out = run(mk(9, "d9") ++ mk(10, "d10")).sortBy(_._1)
    val d10 = out.find(_._1 == "d10").get
    val d9 = out.find(_._1 == "d9").get
    assert(d9._3 == null && d9._4 == "Sin evidencia")
    assert(d10._3 != null && d10._3.asInstanceOf[Double] >= 0.0)
    // all overspeed at noon: rs=1, rn=0 → risk=0.55*1 → score_raw≈99.5 → Inseguro
    assert(d10._4 == "Inseguro" && d10._5 == 10L && d10._6 == 10L && d10._7 == 0L)
  }

  test("all-calm device scores ≈0 and classifies Seguro") {
    val rows = (0 until 12).map(i => ("calm", f"2024-01-10 12:00:$i%02d.0", 30.0))
    val Seq(out) = run(rows)
    // rs=rn=0 → risk_raw=0 → score_raw=100/(1+e^{1.386})≈20.0 → round=20 → Seguro
    assert(out._3.asInstanceOf[Double] <= 20.0 && out._4 == "Seguro")
  }

  test("score is null xor in [0,100]; level always consistent (SURVEY §5.3)") {
    val out = RiskScore.pipeline(
      graft.queries.TelematicsQueries.normalizedFact(spark, sf())).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val total = r.getLong(4)
      val level = r.getString(3)
      if (r.isNullAt(2)) {
        assert(total < 10 && level == "Sin evidencia")
      } else {
        val s = r.getDouble(2)
        assert(total >= 10 && s >= 0.0 && s <= 100.0 && s == math.rint(s))
        assert(level == (if (s <= 20) "Seguro" else if (s <= 60) "Menos seguro" else "Inseguro"))
      }
    }
  }

  test("local-midnight straddle splits device-days correctly") {
    // UTC 2024-01-11 05:59 → local Jan 10 23:59; UTC 06:01 → local Jan 11 00:01
    val rows = (0 until 10).map(i => ("d", f"2024-01-11 05:55:$i%02d.0", 20.0)) ++
      (0 until 10).map(i => ("d", f"2024-01-11 06:05:$i%02d.0", 20.0))
    val out = run(rows).sortBy(_._2)
    assert(out.map(_._2) == Seq("2024-01-10", "2024-01-11"))
    assert(out.forall(_._5 == 10L))
    assert(out.head._7 == 10L) // 23:55 local is night
    assert(out(1)._7 == 10L)   // 00:05 local is night too
  }
}
