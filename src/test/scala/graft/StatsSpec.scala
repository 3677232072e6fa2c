package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE TABLE / CBO surface (SURVEY §4): table and column statistics
  * feed Catalyst's cost-based join planning; at 100 TB they are what let
  * the optimizer pick broadcast vs shuffle and reorder joins correctly.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ANALYZE TABLE computes row and column statistics the optimizer can see") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    val p = new org.apache.hadoop.fs.Path("spark-warehouse/stats_nation")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    Catalog.table(spark, "/root/testdata/sf0.001", "nation")
      .write.mode("overwrite").saveAsTable("stats_nation")
    spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    // row/column stats only reach plan costing with CBO on (off by default)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val stats = spark.table("stats_nation").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(25)), s"row count stat missing: $stats")
    val colStats = stats.attributeStats.map { case (a, s) => a.name -> s }
    assert(colStats.get("n_nationkey").exists(_.distinctCount.contains(BigInt(25))),
      s"column NDV stat missing: $colStats")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS stats_nation")
  }
}
