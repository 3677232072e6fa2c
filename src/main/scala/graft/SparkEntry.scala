package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Registry of every implemented operator query (SURVEY §2) with its
  * DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** All query definitions, grouped by module. */
  def allQ: Seq[Q] =
    Relational.all ++ EventsPipeline.all ++
      graft.ops.TextOps.all ++ graft.ops.Dedup.all ++ graft.ops.Cluster.all ++
      graft.ops.Corpus.all ++ graft.ops.Mining.all ++
      graft.ops.Similarity.all ++ graft.ops.Multimodal.all ++ graft.ops.Sketches.all ++
      graft.ops.AsOf.all ++ graft.ops.RangeJoin.all ++ graft.ops.ForgetOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
