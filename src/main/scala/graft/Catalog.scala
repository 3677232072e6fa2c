package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source registration: typed readers for the driver-provided TPC-H-ish
  * parquet tables (/root/repo/TESTDATA.md) and for the reference's three
  * CSV seed tables (schemas from /root/reference/seeds/schema.yml:1-43 —
  * re-declared here as Spark StructTypes, never inferSchema, so empty CSV
  * cells load as null and ids like "R001" stay strings).
  */
object Catalog {

  /** All driver-provided parquet tables, one file each. */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan. Column pruning + predicate pushdown reach the scan
    * because this stays a plain declarative relation (SURVEY §4).
    *
    * `events.ts` has shipped in two physical encodings across driver data
    * generations: INT64 TIMESTAMP(NANOS) (Spark 4 reads it only as a long
    * via the legacy nanos-as-long conf — we truncate ns→us by integer
    * division, matching DuckDB) and plain TIMESTAMP(MICROS) without the
    * UTC flag (Spark reads TIMESTAMP_NTZ). Both normalize to session-tz
    * TimestampType (session tz is pinned UTC, so the NTZ cast is
    * value-preserving) and downstream operators see one schema.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Set ONCE per session, monotonically (never unset, no reader wants
      // it false): an unconditional set on every read was benign today
      // but a racy pattern if concurrent reads ever differed in needs.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case TimestampType => raw
        case _ => // TIMESTAMP_NTZ parquet; UTC session tz makes this exact
          raw.withColumn("ts", raw("ts").cast(TimestampType))
      }
    } else spark.read.parquet(path)
  }

  /** Spread a NARROW SCAN to session parallelism before a CPU-dense
    * kernel pass (shingling, tokenization, per-token md5, BPE, codec
    * decodes — all ~ms/KB, so partitioning must follow CORES, not bytes).
    * The driver-provided sf parquet files are single-row-group, so their
    * scans cannot split (parquet splits at row-group boundaries) and
    * every scan-side kernel otherwise runs on ONE core of local[N]
    * (measured: q142's three 0.8-1.2 s single-task stages). Scale-adaptive,
    * not a local[32] constant: when the scan already carries ≥
    * defaultParallelism splits — any real multi-row-group/multi-file
    * table, i.e. the 100 TB case — this is a NO-OP and no exchange is
    * added; the round-robin exchange only fires for inputs small enough
    * that shuffling them is trivially cheap (guide §2.5/§1.2: fix the
    * distributed algorithm's parallelism before per-task work).
    *
    * Only call this on exchange-free frames (a Catalog.table scan plus
    * projections): `.rdd.getNumPartitions` on a frame with exchanges
    * would materialize them eagerly under AQE.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tables.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** Format-agnostic source scan — the same table landed as ORC, JSON
    * lines, or CSV instead of parquet (lakehouse ingest rarely controls
    * the producer's format). The schema is always ENFORCED, never
    * inferred: inference samples the data (nondeterministic at scale,
    * a second pass over 100 TB) and widens types under dirty rows,
    * silently changing downstream plans. CSV cannot carry arrays/structs
    * — callers landing `embeddings` there get an AnalysisException, by
    * design. Text formats carry timestamps at MICROSECOND precision
    * ([[TextTimestampFormat]] — the default ISO pattern writes millis
    * and silently truncates; SourcesSpec caught exactly that). SourcesSpec
    * pins byte-identical row sets across all formats for
    * documents/events/embeddings.
    */
  def tableFrom(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = {
    val r = spark.read.schema(schema)
    format match {
      case "parquet" => r.parquet(path)
      case "orc" => r.orc(path)
      case "json" => r.option("timestampFormat", TextTimestampFormat).json(path)
      case "csv" => r.option("header", "true")
        .option("timestampFormat", TextTimestampFormat).csv(path)
      case other => throw new IllegalArgumentException(s"unsupported source format $other")
    }
  }

  /** Timestamp pattern for text landings (JSON/CSV): full microseconds,
    * matching parquet's TIMESTAMP(MICROS) losslessly.
    */
  val TextTimestampFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  // ── Reference seed schemas (seeds/schema.yml) ────────────────────────────

  /** raw_sensor_readings — seeds/schema.yml:4-13. */
  val sensorReadingsSchema: StructType = StructType(Seq(
    StructField("reading_id", StringType),
    StructField("device_id", StringType),
    StructField("metric_name", StringType),
    StructField("metric_value", FloatType),
    StructField("reading_ts", TimestampType),
    StructField("ingested_at", TimestampType)))

  /** raw_devices — seeds/schema.yml:15-27. */
  val devicesSchema: StructType = StructType(Seq(
    StructField("device_id", StringType),
    StructField("device_name", StringType),
    StructField("device_type", StringType),
    StructField("location", StringType),
    StructField("zone", StringType),
    StructField("install_date", DateType),
    StructField("manufacturer", StringType),
    StructField("firmware_version", StringType),
    StructField("is_active", BooleanType)))

  /** raw_alerts — seeds/schema.yml:29-43. */
  val alertsSchema: StructType = StructType(Seq(
    StructField("alert_id", StringType),
    StructField("device_id", StringType),
    StructField("alert_type", StringType),
    StructField("severity", StringType),
    StructField("metric_name", StringType),
    StructField("threshold_value", FloatType),
    StructField("actual_value", FloatType),
    StructField("alert_ts", TimestampType),
    StructField("resolved_at", TimestampType),
    StructField("resolution_notes", StringType)))

  /** Typed CSV seed load (SURVEY §2.1 S1) — dbt-seed equivalent. */
  def seed(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)

  val defaultSeedDir = "/root/reference/seeds"

  def rawSensorReadings(spark: SparkSession, dir: String = defaultSeedDir): DataFrame =
    seed(spark, s"$dir/raw_sensor_readings.csv", sensorReadingsSchema)

  def rawDevices(spark: SparkSession, dir: String = defaultSeedDir): DataFrame =
    seed(spark, s"$dir/raw_devices.csv", devicesSchema)

  def rawAlerts(spark: SparkSession, dir: String = defaultSeedDir): DataFrame =
    seed(spark, s"$dir/raw_alerts.csv", alertsSchema)
}
