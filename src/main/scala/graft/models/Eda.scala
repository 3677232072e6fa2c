package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 7 EDA queries (notebooks/iot_eda_analysis.sql) over the
  * built medallion — SURVEY §2.7 sorts (incl. NULLS LAST) and §2.5 A7
  * HAVING live here.
  */
object Eda {

  /** #1 (iot_eda_analysis.sql:33-43) fleet health scorecard, worst first. */
  def fleetHealth(m: Medallion): DataFrame =
    m.fctDeviceSummary.select(
      col("device_name"), col("plant_location"), col("reading_date"),
      col("health_score"), col("health_category"), col("anomaly_rate_pct"),
      col("critical_alerts"), col("data_completeness_pct"))
      .orderBy(col("health_score").asc)

  /** #2 (:53-62) which devices are running hot. */
  def temperatureAnomalies(m: Medallion): DataFrame =
    m.fctAnomalyEvents
      .filter(col("metric_name") === "temperature")
      .select(col("device_name"), col("plant_location"), col("anomaly_hour"),
        col("actual_value"), col("upper_threshold"), col("breach_direction"))
      .orderBy(col("actual_value").desc)

  /** #3 (:71-80) hourly average temperature time series. */
  def hourlyTemperature(m: Medallion): DataFrame =
    m.fctHourlyMetrics
      .filter(col("metric_name") === "temperature")
      .select(col("reading_hour"), col("device_name"),
        col("avg_value").as("avg_temperature"), col("anomaly_count"),
        col("health_status"))
      .orderBy(col("reading_hour"), col("device_name"))

  /** #4 (:90-101) device fleet lifetime overview. */
  def fleetLifetime(m: Medallion): DataFrame =
    m.dimDevices.select(
      col("device_name"), col("device_type"), col("plant_location"),
      col("manufacturer"), col("days_since_install"), col("lifetime_readings"),
      col("lifetime_anomalies"), col("lifetime_anomaly_rate_pct"), col("is_active"))
      .orderBy(col("lifetime_anomaly_rate_pct").desc)

  /** #5 (:110-120) alert resolution rollup. */
  def alertResolution(m: Medallion): DataFrame =
    m.intAlertsEnriched
      .groupBy(col("device_name"), col("plant_location"))
      .agg(
        count(lit(1)).as("total_alerts"),
        sum(when(col("severity") === "critical", 1).otherwise(0)).as("critical_count"),
        sum(when(col("is_resolved"), 1).otherwise(0)).as("resolved_count"),
        round(avg(col("minutes_to_resolve")), 1).as("avg_resolution_min"))
      .orderBy(col("critical_count").desc)

  /** #6 (:130-141) missing-reading quality check with HAVING (A7). */
  def missingReadings(m: Medallion): DataFrame =
    m.intSensorReadingsCleaned
      .groupBy(col("device_name"), col("metric_name"))
      .agg(
        count(lit(1)).as("total_readings"),
        sum(when(col("is_missing_value"), 1).otherwise(0)).as("missing_count"),
        round(sum(when(col("is_missing_value"), 1).otherwise(0)) * 100.0 / count(lit(1)), 2)
          .as("missing_pct"))
      .filter(col("missing_count") > 0)
      .orderBy(col("missing_pct").desc)

  /** #7 (:151-161) vibration variance, NULLS LAST sort (O2). */
  def vibrationVariance(m: Medallion): DataFrame =
    m.fctHourlyMetrics
      .filter(col("metric_name") === "vibration")
      .select(col("device_name"), col("device_type"), col("plant_location"),
        col("avg_value").as("avg_vibration"), col("max_value").as("peak_vibration"),
        col("stddev_value").as("vibration_stddev"), col("anomaly_rate_pct"))
      .orderBy(col("vibration_stddev").desc_nulls_last)
}
