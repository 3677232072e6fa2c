package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Anomaly-detection thresholds — the reference's dbt vars
  * (dbt_project.yml:18-26). Vibration has no lower bound.
  */
case class Thresholds(
    temperatureUpper: Double = 85.0,
    temperatureLower: Double = 10.0,
    vibrationUpper: Double = 9.0,
    humidityUpper: Double = 90.0,
    humidityLower: Double = 15.0,
    pressureUpper: Double = 1050.0,
    pressureLower: Double = 950.0)

/** Run parameters threaded into every model (SURVEY F3/F4/F17/F18).
  *
  * `frozenNow`/`frozenToday` make `current_timestamp()`/`current_date()`
  * injectable constants so model output is deterministic under test
  * (SURVEY §7.3 risk 2); None falls back to the live clock like the
  * reference.
  */
case class RunConfig(
    thresholds: Thresholds = Thresholds(),
    invocationId: String = "local-run",
    frozenNow: Option[Timestamp] = None,
    frozenToday: Option[Date] = None) {

  /** `current_timestamp()` or the injected constant. */
  def nowCol: Column = frozenNow.map(lit(_)).getOrElse(current_timestamp())

  /** `current_date()` or the injected constant. */
  def todayCol: Column = frozenToday.map(lit(_)).getOrElse(current_date())
}

object RunConfig {
  /** Deterministic config for tests and oracle-diffed runs. */
  val frozen: RunConfig = RunConfig(
    invocationId = "test-invocation",
    frozenNow = Some(Timestamp.valueOf("2025-02-01 00:00:00")),
    frozenToday = Some(Date.valueOf("2025-02-01")))
}
