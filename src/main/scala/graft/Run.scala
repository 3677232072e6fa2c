package graft

import graft.exec.Pipeline
import org.apache.spark.sql.SparkSession

/** CLI entry for the medallion pipeline — the `dbt seed && dbt run &&
  * dbt test` lifecycle (SURVEY §3) as one command:
  *
  *   runMain graft.Run <warehouseDir> [seedDir] [--full-refresh]
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Run <warehouseDir> [seedDir] [--full-refresh]")
    val warehouseDir = args(0)
    val seedDir = args.drop(1).find(!_.startsWith("--")).getOrElse(Catalog.defaultSeedDir)
    val fullRefresh = args.contains("--full-refresh")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = Pipeline.run(spark, warehouseDir, seedDir, fullRefresh = fullRefresh)
    val silverFail = res.silverChecks.filterNot(_.passed)
    val goldFail = res.goldChecks.filterNot(_.passed)
    println(s"[graft] silver checks: ${res.silverChecks.count(_.passed)}/${res.silverChecks.size} passed")
    silverFail.foreach(c => println(s"[graft]   FAIL ${c.model} :: ${c.test} (${c.violations} violations)"))
    if (!res.goldBuilt) println("[graft] GOLD SKIPPED — silver checks failed (gate)")
    else {
      println(s"[graft] gold checks: ${res.goldChecks.count(_.passed)}/${res.goldChecks.size} passed")
      goldFail.foreach(c => println(s"[graft]   FAIL ${c.model} :: ${c.test} (${c.violations} violations)"))
      println(s"[graft] warehouse at $warehouseDir")
    }
    spark.stop()
    if (!res.goldBuilt || !res.allPassed) sys.exit(1)
  }
}
