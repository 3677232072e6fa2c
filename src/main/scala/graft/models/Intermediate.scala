package graft.models

import graft.RunConfig
import graft.functions.Functions.{countIf, surrogateKey}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver layer — incremental models (SURVEY §2.1 S6). Each function is the
  * pure transformation; the incremental/watermark plumbing lives in
  * graft.exec.Materializer so the same logic serves full-refresh and
  * incremental runs (the reference's `is_incremental()` branch).
  */
object Intermediate {

  /** int_sensor_readings_cleaned.sql — dedup (keep latest ingest per
    * reading_id, SURVEY W1), enrich with device metadata (J1), flag missing
    * values and threshold anomalies (F11 + F17 vars).
    *
    * The dedup is idempotence-under-reingestion, NOT content dedup: a
    * content-duplicate row with a fresh reading_id must survive
    * (SURVEY §2.6 caveat, seed row R189).
    */
  def intSensorReadingsCleaned(
      sensorReadings: DataFrame,
      devices: DataFrame,
      cfg: RunConfig): DataFrame = {
    val t = cfg.thresholds
    val w = Window.partitionBy("reading_id").orderBy(col("ingested_at").desc)

    val deduplicated = sensorReadings
      .withColumn("_row_num", row_number().over(w))
      .filter(col("_row_num") === 1)

    val d = devices.select(
      col("device_id").as("_d_device_id"),
      col("device_name"), col("device_type"),
      col("plant_location"), col("factory_zone"), col("manufacturer"))

    val v = col("metric_value")
    val isAnomaly =
      when(col("metric_name") === "temperature" && v.isNotNull &&
        (v > t.temperatureUpper || v < t.temperatureLower), true)
      .when(col("metric_name") === "vibration" && v.isNotNull &&
        (v > t.vibrationUpper), true)
      .when(col("metric_name") === "humidity" && v.isNotNull &&
        (v > t.humidityUpper || v < t.humidityLower), true)
      .when(col("metric_name") === "pressure" && v.isNotNull &&
        (v > t.pressureUpper || v < t.pressureLower), true)
      .otherwise(false)

    deduplicated
      .join(d, deduplicated("device_id") === d("_d_device_id"), "left")
      .select(
        col("reading_id"), col("device_id"), col("metric_name"),
        col("metric_value"), col("reading_ts"), col("ingested_at"),
        col("device_name"), col("device_type"), col("plant_location"),
        col("factory_zone"), col("manufacturer"),
        col("metric_value").isNull.as("is_missing_value"),
        isAnomaly.as("is_anomaly"),
        cfg.nowCol.as("_dbt_processed_at"))
  }

  /** int_device_health.sql — hourly per-device-per-metric stats (SURVEY A1):
    * count/avg/min/max/stddev (sample), anomaly counts and rate, latest
    * reading, surrogate key over (device_id, metric_name, hour).
    *
    * Spark plans this as partial+final HashAggregate — map-side combine
    * keeps the shuffle to one row per (device, metric, hour) group, which
    * is what makes the rollup scale to 100 TB of readings.
    */
  def intDeviceHealth(cleanedReadings: DataFrame, cfg: RunConfig): DataFrame = {
    val readings = cleanedReadings.filter(col("is_missing_value") === false)
    readings
      .groupBy(
        col("device_id"), col("device_name"), col("device_type"),
        col("plant_location"), col("factory_zone"), col("metric_name"),
        date_trunc("hour", col("reading_ts")).as("reading_hour"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(avg(col("metric_value")), 2).as("avg_value"),
        round(min(col("metric_value")), 2).as("min_value"),
        round(max(col("metric_value")), 2).as("max_value"),
        round(stddev(col("metric_value")), 2).as("stddev_value"),
        countIf(col("is_anomaly")).as("anomaly_count"),
        round(countIf(col("is_anomaly")) * 100.0 / nullif(count(lit(1)), lit(0)), 1)
          .as("anomaly_rate_pct"),
        max(col("reading_ts")).as("latest_reading_ts"))
      .select(
        surrogateKey(col("device_id"), col("metric_name"), col("reading_hour"))
          .as("device_health_key"),
        col("*"),
        cfg.nowCol.as("_dbt_processed_at"))
  }

  /** int_alerts_enriched.sql — alerts ⟕ devices (J2) + resolution time
    * (F9/F10) + severity scoring (F12).
    */
  def intAlertsEnriched(alerts: DataFrame, devices: DataFrame, cfg: RunConfig): DataFrame = {
    val d = devices.select(
      col("device_id").as("_d_device_id"),
      col("device_name"), col("device_type"), col("plant_location"),
      col("factory_zone"), col("manufacturer"), col("days_since_install"))

    alerts
      .join(d, alerts("device_id") === d("_d_device_id"), "left")
      .select(
        col("alert_id"), col("device_id"), col("alert_type"), col("severity"),
        col("metric_name"), col("threshold_value"), col("actual_value"),
        col("alert_ts"), col("resolved_at"), col("resolution_notes"),
        col("is_resolved"),
        col("device_name"), col("device_type"), col("plant_location"),
        col("factory_zone"), col("manufacturer"), col("days_since_install"),
        when(col("is_resolved"),
          round((unix_timestamp(col("resolved_at")) - unix_timestamp(col("alert_ts"))) / 60.0, 1))
          .otherwise(lit(null)).as("minutes_to_resolve"),
        when(col("severity") === "critical", 3)
          .when(col("severity") === "warning", 2)
          .when(col("severity") === "info", 1)
          .otherwise(0).as("severity_score"),
        cfg.nowCol.as("_dbt_processed_at"))
  }
}
