package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join story for 100 TB fact-to-fact joins:
  * both tables pre-hashed into the same bucket layout on the join key
  * means the sort-merge join reads matching buckets directly — NO
  * exchange on either side at query time. The shuffle is paid once at
  * write time instead of on every join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle on either side") {
    val o = Catalog.table(spark, sf, "orders")
    val l = Catalog.table(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously-failed run can leave the managed location behind even
    // after DROP TABLE — remove the physical dirs so CTAS can recreate
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force the sort-merge path (tiny test tables would broadcast and the
    // bucket layout would never be exercised)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must run shuffle-free: the only allowed exchange is
    // the one feeding the final aggregation
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin")
    assert(joinSection.length >= 2, s"expected a join in:\n$plan")
    val belowJoin = joinSection.last
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey")
      && !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // and the result matches the unbucketed plan
    val expect = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
