package graft.queries

import graft.Tables
import graft.ingest.Normalize
import graft.score.RiskScore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity queries over the telematics pipeline, mapped onto the
  * driver's `events` table (FIXTURES.md §2). Each entry has a DuckDB oracle in
  * [[oracles]]; names and output column names must match exactly (driver
  * hash-compares after sorting columns by name).
  *
  * Oracle TZ note: the pipeline computes local time in America/Mexico_City via
  * `convert_timezone`; the testdata spans Jan 2024 where that zone is a fixed
  * UTC-6 (Mexico abolished DST in 2022), so the oracle uses
  * `ts - INTERVAL 6 HOUR` — exact for this data.
  */
object TelematicsQueries {

  /** events → Kafka-edge shape → normalized fact table (S1/K1 + F1-F5 + P1). */
  def normalizedFact(spark: SparkSession, dir: String): DataFrame =
    Normalize.normalizeTelemetry(Normalize.eventsAsKafkaEdge(Tables.events(spark, dir)))

  /** DuckDB SQL producing the same normalized fact rows from `events`. */
  private val normalizeOracle: String =
    """WITH edge AS (
      |  SELECT
      |    CASE WHEN event_type = 'error' THEN 'ALERT'
      |         WHEN event_type = 'purchase' THEN 'STATUS'
      |         ELSE upper(event_type) END AS report_type,
      |    'tenant0' AS tenant,
      |    'src' || (user_id % 3)::VARCHAR AS provider,
      |    'm1' AS model, 'fw1' AS firmware,
      |    user_id::VARCHAR AS device_id,
      |    CASE WHEN event_type = 'error' THEN event_type END AS alert_type,
      |    value / 10.0 - 9.0 AS latitude,
      |    value / 5.0 - 99.0 AS longitude,
      |    (event_id % 2 = 0) AS gps_fixed,
      |    date_trunc('second', ts) AS gps_epoch,
      |    (event_id % 13)::BIGINT AS satellites,
      |    value AS speed_kmh,
      |    'N' AS heading,
      |    (event_id * 17)::BIGINT AS odometer_meters,
      |    true AS engine_on,
      |    12.6::DOUBLE AS vehicle_battery_voltage,
      |    4.1::DOUBLE AS backup_battery_voltage,
      |    date_trunc('second', ts) AS received_epoch,
      |    date_trunc('second', ts) AS decoded_epoch,
      |    event_id::VARCHAR AS correlation_id,
      |    list_reduce(list_prepend(0::HUGEINT,
      |        list_transform(range(1, length(user_id::VARCHAR)+1),
      |                       i -> ord((user_id::VARCHAR)[i])::HUGEINT)),
      |      (a, b) -> (a*31 + b) % 4294967296) AS __h
      |  FROM events
      |)
      |SELECT * EXCLUDE (__h),
      |  (abs(CASE WHEN __h >= 2147483648 THEN __h - 4294967296 ELSE __h END) % 32)::INTEGER
      |    AS device_id_bucket,
      |  CAST(received_epoch AS DATE) AS received_day
      |FROM edge
      |WHERE report_type IN ('STATUS','ALERT')
      |ORDER BY CAST(correlation_id AS BIGINT)""".stripMargin

  /** DuckDB CTE reproducing the normalized fact's scoring-relevant columns. */
  private val factCte: String =
    """fact AS (
      |  SELECT
      |    user_id::VARCHAR AS device_id,
      |    date_trunc('second', ts) AS gps_epoch,
      |    value AS speed_kmh
      |  FROM events
      |  WHERE event_type IN ('error', 'purchase')
      |)""".stripMargin

  private val scoreOracle: String =
    s"""WITH $factCte,
      |base AS (
      |  SELECT device_id,
      |    CAST(gps_epoch - INTERVAL 6 HOUR AS DATE) AS report_date,
      |    speed_kmh,
      |    extract(hour FROM gps_epoch - INTERVAL 6 HOUR) AS gps_hour_local
      |  FROM fact
      |),
      |agg AS (
      |  SELECT device_id, report_date,
      |    count(*) AS total_reports,
      |    CAST(sum(CASE WHEN speed_kmh > 110 THEN 1 ELSE 0 END) AS BIGINT) AS overspeed_reports,
      |    CAST(sum(CASE WHEN gps_hour_local >= 23 OR gps_hour_local < 4 THEN 1 ELSE 0 END) AS BIGINT) AS night_reports
      |  FROM base GROUP BY device_id, report_date
      |),
      |scored AS (
      |  SELECT *,
      |    100.0 / (1.0 + exp(-12.0 * (
      |      0.55 * power(overspeed_reports::DOUBLE / total_reports, 1.7)
      |      + 0.30 * power(night_reports::DOUBLE / total_reports, 1.3)
      |      + 0.15 * (overspeed_reports::DOUBLE / total_reports) * (night_reports::DOUBLE / total_reports)
      |      - 0.1155))) AS score_raw
      |  FROM agg
      |)
      |SELECT device_id, report_date,
      |  CASE WHEN total_reports < 10 THEN NULL
      |       ELSE least(greatest(round(score_raw), 0), 100)::DOUBLE END AS score,
      |  CASE WHEN total_reports < 10 THEN 'Sin evidencia'
      |       WHEN least(greatest(round(score_raw), 0), 100) <= 20 THEN 'Seguro'
      |       WHEN least(greatest(round(score_raw), 0), 100) <= 60 THEN 'Menos seguro'
      |       ELSE 'Inseguro' END AS level,
      |  total_reports, overspeed_reports, night_reports
      |FROM scored
      |ORDER BY device_id, report_date""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_normalize" -> ((s, dir) =>
      normalizedFact(s, dir).orderBy(col("correlation_id").cast("long"))),
    "q_risk_score_daily" -> ((s, dir) =>
      RiskScore.pipeline(normalizedFact(s, dir))
        .orderBy(col("device_id"), col("report_date")))
  )

  val oracles: Map[String, String] = Map(
    "q_ingest_normalize" -> normalizeOracle,
    "q_risk_score_daily" -> scoreOracle
  )
}
