package graft

import graft.exec.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must be a pure performance rewrite: results identical to the
  * unsalted plan, salt deterministic across evaluations.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key — the aggregation-skew shape
  private lazy val skewed = (1 to 10000)
    .map(i => (if (i % 10 == 0) i % 7 else 999, i.toLong, s"p$i"))
    .toDF("key", "v", "payload")

  test("saltedAgg equals plain groupBy (count + sum decomposition)") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(
      skewed, Seq("key"), salt = 16, saltBy = Seq("payload"),
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      combine = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join and preserves row multiplicity") {
    val dim = (0 to 6).map(k => (k, s"name$k")).toDF("key", "name")
      .unionByName(Seq((999, "hot")).toDF("key", "name"))
    val plain = skewed.join(dim, Seq("key")).select("key", "v", "name")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", salt = 8,
      bigSaltBy = Seq("payload")).select("key", "v", "name")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("salt is deterministic across evaluations") {
    val a = skewed.select(Skew.saltCol(16, col("payload")).as("s")).collect().map(_.getInt(0)).toSeq
    val b = skewed.select(Skew.saltCol(16, col("payload")).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a === b)
    assert(a.distinct.size > 1, "salt must actually spread")
  }
}
