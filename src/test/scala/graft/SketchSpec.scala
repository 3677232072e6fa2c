package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** HLL sketch semantics, pinned independently of the DuckDB oracles:
  * accuracy within the estimator's standard-error envelope at two register
  * sizes, lossless merge algebra (the 100 TB property: per-partition
  * sketches fold to exactly the whole-table sketch), and the degenerate
  * shapes (single key, absent buckets).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keyed(n: Int) =
    (1 to n).map(i => (i % 2, s"key-$i")).toDF("g", "k")

  test("estimate lands within 3 sigma of the true cardinality at p=6 and p=8") {
    val df = keyed(5000) // 2500 distinct per group
    for (p <- Seq(6, 8)) {
      val sigma = 1.04 / math.sqrt((1 << p).toDouble)
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq("g"), col("k"), p), Seq("g"), p)
        .select("hll_estimate").collect().map(_.getDouble(0))
      assert(est.length === 2)
      est.foreach { e =>
        assert(math.abs(e - 2500.0) / 2500.0 < 3 * sigma,
          s"p=$p estimate $e vs 2500 outside 3 sigma (${3 * sigma})")
      }
    }
  }

  test("per-partition registers merged by max equal the whole-table registers") {
    val df = keyed(3000).withColumn("part", (length(col("k")) % 3).cast("int"))
    val whole = Sketches.hllRegisters(df, Seq("g"), col("k"), 6)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = Sketches.hllRegisters(df, Seq("g", "part"), col("k"), 6)
      .groupBy("g", "bucket").agg(max("r").as("r"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged === whole)
  }

  test("merged and direct estimates are bit-equal doubles (q109 invariant at sf0.001)") {
    val out = Sketches.q109.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merge_exact_match"),
        s"register denominators diverged for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Double]("merged_estimate") == r.getAs[Double]("direct_estimate"))
    }
  }

  test("single-key group occupies one bucket; absent buckets carry r=0 weight") {
    val one = Seq((0, "only-key")).toDF("g", "k")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(one, Seq("g"), col("k"), 6), Seq("g"), 6)
      .collect().head
    assert(est.getAs[Long]("n_buckets") === 1L)
    val maxRho = Sketches.maxRho(6)
    // 63 empty buckets at 2^maxRho plus the one occupied bucket's term
    val denom = est.getAs[Long]("reg_denom")
    assert(denom > 63L * (1L << maxRho) && denom <= 64L * (1L << maxRho))
  }

  test("rho is the leading-zero rank of the hash suffix") {
    // hand-checked values: w = h60 >> 6; rho = 55 - bitlength(w), 55 at w=0
    val df = Seq("a", "b", "c").toDF("k")
    val got = df.select(
      ops.Dedup.h60Col(col("k")).as("h"),
      Sketches.hllRho(ops.Dedup.h60Col(col("k")), 6).as("rho"))
      .collect()
    got.foreach { r =>
      val w = r.getLong(0) >> 6
      val expected = if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      assert(r.getInt(1) === expected)
    }
  }
}
