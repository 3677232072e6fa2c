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

  test("corrected estimator holds its error envelope over a 1 -> 50*m cardinality sweep") {
    // the production regime split (raw FFGM above ~2.5*m, linear counting
    // below): for every n the corrected estimate must stay within the
    // estimator's published envelope — linear counting is near-exact at
    // tiny n where the raw estimator's collision bias dominates, and the
    // branch must hand over to raw continuously above the boundary.
    val p = 6
    val m = 1 << p // 64; sweep 1 -> 3200 = 50*m
    val sweep = Seq(1, 2, 5, 10, 25, 50, 100, 160, 320, 640, 1600, 3200)
    val sigma = 1.04 / math.sqrt(m.toDouble)
    for (n <- sweep) {
      val df = (1 to n).map(i => (0, s"sweep-key-$i")).toDF("g", "k")
      val row = Sketches.hllEstimateCorrected(
        Sketches.hllRegisters(df, Seq("g"), col("k"), p), Seq("g"), p)
        .collect().head
      val corrected = row.getAs[Double]("hll_corrected")
      val absErr = math.abs(corrected - n)
      val relErr = absErr / n.toDouble
      // the PUBLISHED envelopes: linear counting's standard error is
      // sqrt(m(e^t - t - 1))/t at load t = n/m (Whang et al. 1990),
      // the raw FFGM regime's is 1.04/sqrt(m); the branch choice depends
      // on the raw estimate, so accept either 3-sigma envelope (plus a
      // 2-key absolute floor where one collision is the whole error)
      val t = n.toDouble / m
      val seLc = math.sqrt(m * (math.exp(t) - t - 1.0)) / t
      val ok = absErr <= 3 * seLc || relErr <= 3 * sigma || absErr <= 2.0
      assert(ok, s"n=$n corrected=$corrected absErr=$absErr relErr=$relErr " +
        s"outside both envelopes (3*seLc=${3 * seLc}, 3*sigma_rel=${3 * sigma})")
    }
    // the small-range fix matters: at n = m/2 the raw estimator is far
    // outside the envelope the corrected one satisfies
    val small = (1 to m / 2).map(i => (0, s"sweep-key-$i")).toDF("g", "k")
    val sr = Sketches.hllEstimateCorrected(
      Sketches.hllRegisters(small, Seq("g"), col("k"), p), Seq("g"), p)
      .collect().head
    val rawErr = math.abs(sr.getAs[Double]("hll_estimate") - m / 2) / (m / 2).toDouble
    val corErr = math.abs(sr.getAs[Double]("hll_corrected") - m / 2) / (m / 2).toDouble
    assert(corErr < rawErr, "correction must strictly beat raw in the small range")
    assert(rawErr > 0.15, s"raw small-range bias should be visible (got $rawErr)")
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

  test("KMV buffer keeps distinct order statistics — duplicates never crowd it") {
    val base = (1 to 400).map(i => (0, s"v-$i")).toDF("g", "k")
    val dup = base.union(base).union(base) // every key 3x
    def mins(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g")
        .agg(functions.KmvMin.kmvMin(64)(ops.Dedup.h60Col(col("k"))).as("m"))
        .collect().head.getSeq[Long](1)
    val m = mins(base)
    assert(m === mins(dup))
    assert(m.length === 64 && m === m.distinct.sorted)
  }

  test("KMV sketch of fewer than k distinct keys IS the exact hash set") {
    val small = (1 to 20).map(i => (0, s"s-$i")).toDF("g", "k")
    val m = small.groupBy("g")
      .agg(functions.KmvMin.kmvMin(64)(ops.Dedup.h60Col(col("k"))).as("m"))
      .collect().head.getSeq[Long](1)
    val exact = small.select(ops.Dedup.h60Col(col("k"))).collect().map(_.getLong(0)).distinct.sorted
    assert(m === exact.toSeq)
  }

  test("merging two KMV sketches equals the sketch of the concatenated corpus") {
    val left = (1 to 1500).map(i => (0, s"l-$i")).toDF("g", "k")
    val right = (1000 to 2500).map(i => (0, s"l-$i")).toDF("g", "k") // overlapping keys
    def mins(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g")
        .agg(functions.KmvMin.kmvMin(128)(ops.Dedup.h60Col(col("k"))).as("m"))
        .collect().head.getSeq[Long](1)
    val merged = (mins(left) ++ mins(right)).distinct.sorted.take(128)
    assert(merged === mins(left.union(right)))
  }

  test("KMV union estimate lands within 3 sigma at k=256") {
    val df = (1 to 4000).map(i => (0, s"u-$i")).toDF("g", "k")
    val m = df.groupBy("g")
      .agg(functions.KmvMin.kmvMin(256)(ops.Dedup.h60Col(col("k"))).as("m"))
      .collect().head.getSeq[Long](1)
    val est = 255.0 * math.pow(2.0, 60) / m.last.toDouble
    val sigma = 1.0 / math.sqrt(254.0) // KMV relative error ~ 1/sqrt(k-2)
    assert(math.abs(est - 4000.0) / 4000.0 < 3 * sigma, s"estimate $est vs 4000")
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
