package graft.models

import graft.RunConfig
import graft.functions.Functions.{countIf, surrogateKey}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold layer — full-table marts (SURVEY §2.1 S7). */
object Marts {

  /** fct_hourly_metrics.sql — BI time dims + health classification over
    * the hourly health rollup.
    */
  def fctHourlyMetrics(deviceHealth: DataFrame, cfg: RunConfig): DataFrame =
    deviceHealth.select(
      col("device_health_key"), col("device_id"), col("device_name"),
      col("device_type"), col("plant_location"), col("factory_zone"),
      col("metric_name"), col("reading_hour"),
      col("reading_count"), col("avg_value"), col("min_value"),
      col("max_value"), col("stddev_value"), col("anomaly_count"),
      col("anomaly_rate_pct"), col("latest_reading_ts"),
      to_date(col("reading_hour")).as("reading_date"),
      hour(col("reading_hour")).as("hour_of_day"),
      dayofweek(col("reading_hour")).as("day_of_week"),
      when(col("anomaly_rate_pct") >= 50.0, "critical")
        .when(col("anomaly_rate_pct") >= 25.0, "degraded")
        .when(col("anomaly_rate_pct") > 0, "warning")
        .otherwise("healthy").as("health_status"),
      cfg.nowCol.as("_dbt_created_at"))

  /** fct_device_summary.sql — daily scorecard: reading stats (A2) ⟕ alert
    * rollup (A3) on the composite (device_id, date) key (J3), plus the
    * coalesce/nullif/greatest health-score formula (F13-F15).
    */
  def fctDeviceSummary(
      cleanedReadings: DataFrame,
      alertsEnriched: DataFrame,
      cfg: RunConfig): DataFrame = {

    val dailyReadings = cleanedReadings
      .groupBy(
        col("device_id"), col("device_name"), col("device_type"),
        col("plant_location"), col("factory_zone"),
        to_date(col("reading_ts")).as("reading_date"))
      .agg(
        count(lit(1)).as("total_readings"),
        countIf(col("is_missing_value")).as("missing_readings"),
        countIf(col("is_anomaly")).as("anomaly_readings"),
        round((count(lit(1)) - countIf(col("is_missing_value"))) * 100.0 /
          nullif(count(lit(1)), lit(0)), 1).as("data_completeness_pct"),
        round(countIf(col("is_anomaly")) * 100.0 /
          nullif(count(lit(1)), lit(0)), 1).as("anomaly_rate_pct"),
        min(col("reading_ts")).as("first_reading_ts"),
        max(col("reading_ts")).as("last_reading_ts"))

    // Null alert_ts rows (seed ALT024) group under a null alert_date and
    // never match the composite join — exactly the reference behavior.
    val dailyAlerts = alertsEnriched
      .groupBy(col("device_id").as("a_device_id"), to_date(col("alert_ts")).as("alert_date"))
      .agg(
        count(lit(1)).as("a_total_alerts"),
        countIf(col("severity") === "critical").as("a_critical_alerts"),
        countIf(col("severity") === "warning").as("a_warning_alerts"),
        countIf(col("is_resolved")).as("a_resolved_alerts"),
        round(avg(when(col("minutes_to_resolve").isNotNull, col("minutes_to_resolve"))), 1)
          .as("a_avg_resolution_minutes"))

    dailyReadings
      .join(dailyAlerts,
        dailyReadings("device_id") === dailyAlerts("a_device_id") &&
          dailyReadings("reading_date") === dailyAlerts("alert_date"),
        "left")
      .select(
        surrogateKey(col("device_id"), col("reading_date")).as("device_summary_key"),
        col("device_id"), col("device_name"), col("device_type"),
        col("plant_location"), col("factory_zone"), col("reading_date"),
        col("total_readings"), col("missing_readings"), col("anomaly_readings"),
        col("data_completeness_pct"), col("anomaly_rate_pct"),
        col("first_reading_ts"), col("last_reading_ts"),
        coalesce(col("a_total_alerts"), lit(0)).as("total_alerts"),
        coalesce(col("a_critical_alerts"), lit(0)).as("critical_alerts"),
        coalesce(col("a_warning_alerts"), lit(0)).as("warning_alerts"),
        coalesce(col("a_resolved_alerts"), lit(0)).as("resolved_alerts"),
        col("a_avg_resolution_minutes").as("avg_resolution_minutes"),
        round(greatest(lit(0),
          lit(100)
            - (coalesce(col("a_critical_alerts"), lit(0)) * 20)
            - (coalesce(col("a_warning_alerts"), lit(0)) * 5)
            - (col("anomaly_rate_pct") * 0.5)
            - ((lit(100) - col("data_completeness_pct")) * 0.3)), 0)
          .as("health_score"),
        when(coalesce(col("a_critical_alerts"), lit(0)) > 3, "critical")
          .when(coalesce(col("a_critical_alerts"), lit(0)) > 0, "at_risk")
          .when(col("anomaly_rate_pct") > 10, "degraded")
          .otherwise("healthy").as("health_category"),
        cfg.nowCol.as("_dbt_created_at"))
  }

  /** fct_anomaly_events.sql — flattened anomaly events with threshold
    * context and breach direction (F11/F12 + var lookups F17).
    */
  def fctAnomalyEvents(cleanedReadings: DataFrame, cfg: RunConfig): DataFrame = {
    val t = cfg.thresholds
    val m = col("metric_name")
    val upperThreshold =
      when(m === "temperature", t.temperatureUpper)
        .when(m === "vibration", t.vibrationUpper)
        .when(m === "humidity", t.humidityUpper)
        .when(m === "pressure", t.pressureUpper)
    val lowerThreshold =
      when(m === "temperature", t.temperatureLower)
        .when(m === "humidity", t.humidityLower)
        .when(m === "pressure", t.pressureLower)
        .otherwise(lit(null))

    cleanedReadings
      .filter(col("is_anomaly") === true)
      .select(
        surrogateKey(col("reading_id")).as("anomaly_event_key"),
        col("reading_id"), col("device_id"), col("device_name"),
        col("device_type"), col("plant_location"), col("factory_zone"),
        col("manufacturer"), col("metric_name"),
        col("metric_value").as("actual_value"),
        upperThreshold.as("upper_threshold"),
        lowerThreshold.as("lower_threshold"),
        col("reading_ts").as("anomaly_ts"),
        to_date(col("reading_ts")).as("anomaly_date"),
        hour(col("reading_ts")).as("anomaly_hour"),
        when(m.isin("temperature", "humidity", "pressure") &&
          col("metric_value") >
            when(m === "temperature", t.temperatureUpper)
              .when(m === "humidity", t.humidityUpper)
              .when(m === "pressure", t.pressureUpper),
          "above_upper")
          .otherwise("below_lower").as("breach_direction"),
        cfg.nowCol.as("_dbt_created_at"))
  }

  /** dim_devices.sql — SCD Type 1 device dimension with lifetime stats
    * (A4 + J4 + F16 surrogate key).
    */
  def dimDevices(stgDevices: DataFrame, cleanedReadings: DataFrame, cfg: RunConfig): DataFrame = {
    val stats = cleanedReadings
      .groupBy(col("device_id").as("s_device_id"))
      .agg(
        count(lit(1)).as("total_readings"),
        countIf(col("is_anomaly")).as("total_anomalies"),
        countIf(col("is_missing_value")).as("total_missing"),
        min(col("reading_ts")).as("s_first_reading_ts"),
        max(col("reading_ts")).as("s_last_reading_ts"))

    stgDevices
      .join(stats, stgDevices("device_id") === stats("s_device_id"), "left")
      .select(
        surrogateKey(col("device_id")).as("device_key"),
        col("device_id"), col("device_name"), col("device_type"),
        col("plant_location"), col("factory_zone"), col("install_date"),
        col("manufacturer"), col("firmware_version"), col("is_active"),
        col("days_since_install"),
        coalesce(col("total_readings"), lit(0)).as("lifetime_readings"),
        coalesce(col("total_anomalies"), lit(0)).as("lifetime_anomalies"),
        coalesce(col("total_missing"), lit(0)).as("lifetime_missing_readings"),
        col("s_first_reading_ts").as("first_reading_ts"),
        col("s_last_reading_ts").as("last_reading_ts"),
        when(col("total_readings") > 0,
          round(col("total_anomalies") * 100.0 / col("total_readings"), 2))
          .otherwise(0).as("lifetime_anomaly_rate_pct"),
        cfg.nowCol.as("_valid_from"),
        lit(null).cast("timestamp").as("_valid_to"),
        lit(true).as("_is_current"),
        cfg.nowCol.as("_dbt_created_at"))
  }
}
