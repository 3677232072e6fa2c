package graft.exec

import graft.models.Medallion
import org.apache.spark.sql.DataFrame

/** `dbt docs generate` analog (reference .github/workflows/dbt_ci.yml:47-51
  * runs it in CI): a machine-readable manifest of the model DAG — name,
  * layer, materialization, upstream dependencies, and the ACTUAL output
  * columns taken from each model's resolved schema (not hand-maintained
  * docs that drift). Driver-side metadata only; nothing here touches data.
  */
object Lineage {

  /** The declared DAG — mirrors the reference's ref()/source() graph
    * (the sql models under models/staging, models/intermediate,
    * models/marts) and, by construction, `Medallion.build`'s call wiring.
    */
  val dependencies: Map[String, Seq[String]] = Map(
    "stg_sensor_readings" -> Seq("source.raw_sensor_readings"),
    "stg_devices" -> Seq("source.raw_devices"),
    "stg_alerts" -> Seq("source.raw_alerts"),
    "int_sensor_readings_cleaned" -> Seq("stg_sensor_readings", "stg_devices"),
    "int_device_health" -> Seq("int_sensor_readings_cleaned"),
    "int_alerts_enriched" -> Seq("stg_alerts", "stg_devices"),
    "fct_hourly_metrics" -> Seq("int_device_health"),
    "fct_device_summary" -> Seq("int_sensor_readings_cleaned", "int_alerts_enriched"),
    "fct_anomaly_events" -> Seq("int_sensor_readings_cleaned"),
    "dim_devices" -> Seq("stg_devices", "int_sensor_readings_cleaned"))

  private def layerOf(name: String): String =
    if (name.startsWith("stg_")) "bronze"
    else if (name.startsWith("int_")) "silver"
    else "gold"

  private def materializationOf(name: String): String =
    if (name.startsWith("stg_")) "view"
    else if (name.startsWith("int_")) "incremental"
    else "table"

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One manifest node per model, in dependency order. */
  def manifest(m: Medallion): String = {
    val nodes = m.byName.map { case (name, df) =>
      val cols = df.schema.fields
        .map(f => s"{${jstr(f.name)}:${jstr(f.dataType.simpleString)}}")
        .mkString("[", ",", "]")
      val deps = dependencies(name).map(jstr).mkString("[", ",", "]")
      s"""{"name":${jstr(name)},"layer":${jstr(layerOf(name))},""" +
        s""""materialization":${jstr(materializationOf(name))},""" +
        s""""depends_on":$deps,"columns":$cols}"""
    }
    nodes.mkString("{\"nodes\":[", ",", "]}")
  }

  /** Kahn topological order of the declared DAG (models only; sources are
    * roots). Throws on a cycle — the spec exercises this.
    */
  def topologicalOrder(deps: Map[String, Seq[String]] = dependencies): Seq[String] = {
    val modelDeps = deps.map { case (k, v) => k -> v.filter(deps.contains) }
    val order = scala.collection.mutable.ArrayBuffer[String]()
    val done = scala.collection.mutable.Set[String]()
    var remaining = modelDeps
    while (remaining.nonEmpty) {
      val ready = remaining.collect { case (k, v) if v.forall(done) => k }.toSeq.sorted
      require(ready.nonEmpty, s"cycle among: ${remaining.keys.mkString(", ")}")
      ready.foreach { k => order += k; done += k }
      remaining = remaining -- ready
    }
    order.toSeq
  }

  def writeManifest(m: Medallion, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, manifest(m).getBytes("UTF-8"))
  }
}
