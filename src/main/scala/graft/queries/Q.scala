package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle (SURVEY §5: every
  * SQL-expressible operator carries an oracle; non-SQL-expressible ops
  * (minhash/simhash/...) omit it and get the driver's rows-only check).
  */
case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
