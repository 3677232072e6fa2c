package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query must execute end-to-end at sf0.001 and
  * return a schema with at least one row or a well-defined empty result —
  * the in-suite mirror of the driver's t1 smoke, so a broken query fails
  * `sbt test` instead of the round.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // queries with legitimately-empty results at any SF (q83: cross-source
  // exact duplicates first appear in the sf0.1 corpus)
  private val mayBeEmpty = Set("q05_customers_no_orders", "q83_source_overlap")

  test("every query has an oracle (the correctness gate covers the full surface)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.schema.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
