package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-safety rewrites of round 3, pinned semantically: the
  * distributed prefix sum and histogram rank selection must equal their
  * naive single-task forms, and the exact-dedup-first near-dup pipeline
  * must keep band-collision candidates density-bounded when the corpus
  * contains exact-duplicate clusters (the SURVEY §8 blowup).
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("PrefixSum.runningTotal equals the global-window running sum") {
    val toks = Catalog.table(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("v"))
    val naive = toks.withColumn("cum",
      sum("v").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = exec.PrefixSum.runningTotal(toks, "doc_id", "v", "cum", nBuckets = 7)
      .select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === naive)
  }

  test("PrefixSum handles sparse/skewed keys and the empty input") {
    import spark.implicits._
    // keys with huge gaps → most fixed-stride buckets empty, all rows in few
    val skewed = Seq((1L, 10L), (2L, 20L), (3L, 5L), (1000000L, 7L), (1000001L, 1L))
      .toDF("k", "v")
    val got = exec.PrefixSum.runningTotal(skewed, "k", "v", "cum", nBuckets = 8)
      .orderBy("k").select("cum").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(10L, 30L, 35L, 42L, 43L))
    val empty = exec.PrefixSum.runningTotal(skewed.filter(col("k") < 0), "k", "v", "cum")
    assert(empty.count() === 0)
  }

  test("RankSelect.groupMedian equals the full-sort window median") {
    val ev = Catalog.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    val w = Window.partitionBy("event_type")
    val naive = ev
      .withColumn("rn", row_number().over(w.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rn") === floor((col("n") + 1) / 2.0).cast("long"))
      .select(col("event_type"), col("value"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = ops.RankSelect.groupMedian(ev, "event_type", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === naive)
  }

  test("RankSelect.groupQuantiles equals the full-sort window selection") {
    val ev = Catalog.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    val ps = Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99)
    val w = Window.partitionBy("event_type")
    val ranked = ev
      .withColumn("rn", row_number().over(w.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(w))
    val naive = ps.map { case (_, p) =>
      ranked.filter(col("rn") === (floor((col("n") - 1) * p) + 1).cast("long"))
        .select("event_type", "value")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val got = ops.RankSelect.groupQuantiles(ev, "event_type", "value", "event_id", ps)
      .collect()
    got.foreach { r =>
      ps.zipWithIndex.foreach { case ((label, _), i) =>
        assert(r.getAs[Double](label) === naive(i)(r.getString(0)),
          s"$label mismatch for ${r.getString(0)}")
      }
    }
    assert(got.length === naive.head.size)
  }

  test("RankSelect handles constant-value and single-row groups") {
    import spark.implicits._
    val df = Seq(
      ("const", 5.0, 1L), ("const", 5.0, 2L), ("const", 5.0, 3L),
      ("single", 9.0, 4L),
      ("two", 1.0, 5L), ("two", 2.0, 6L),
      // negatives exercise the all-bits-flipped half of the radix encoding
      ("neg", -5.0, 7L), ("neg", -1.0, 8L), ("neg", -3.0, 9L),
      ("mixed", -2.0, 10L), ("mixed", 0.0, 11L), ("mixed", 4.0, 12L), ("mixed", 1.0, 13L))
      .toDF("g", "value", "id")
    val got = ops.RankSelect.groupMedian(df, "g", "value", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === Set(("const", 5.0, 3L), ("single", 9.0, 1L), ("two", 1.0, 2L),
      ("neg", -3.0, 3L), ("mixed", 0.0, 4L)))
  }

  test("nearDupPipeline keeps band candidates density-bounded under exact-dup clusters") {
    val docs = Catalog.table(spark, sf, "documents").select("doc_id", "text")
    val k = 5
    // corpus with every document exactly duplicated k× under shifted ids —
    // the degenerate occupancy that blew simhash banding up 27M-pairs-wide
    // in the 10× probe
    val dup = (0 until k).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val basePairs = ops.Dedup.nearDupPipeline(docs, hammingMax = 60).count()
    val naivePairs = ops.Dedup.simhashCandidates(ops.Dedup.simhash(dup)).count()
    val pipelinePairs = ops.Dedup.nearDupPipeline(dup, hammingMax = 60).count()
    val nDocs = docs.count()
    // naive banding on the duplicated corpus explodes at least quadratically
    // in copy count (each identical copy collides with every other)
    assert(naivePairs >= nDocs * k * (k - 1) / 2,
      s"expected the quadratic blowup, got $naivePairs")
    // the pipeline collapses exact dups first: candidates equal the base
    // corpus's — bounded by near-dup density, not copy count
    assert(pipelinePairs === basePairs,
      s"pipeline candidates $pipelinePairs must equal base-corpus candidates $basePairs")
  }

  test("linkageCandidates: pairs scale linearly with corpus size, not quadratically") {
    import spark.implicits._
    // worst case for naive blocking: the WHOLE corpus lands in ONE
    // (nation, segment) block, the regime where a fixed-cardinality block
    // key meets a growing corpus and a within-block self-join goes B²
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, f"Customer#$i%09d", 1L, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val w = ops.Mining.LinkageWindow
    val small = ops.Mining.linkageCandidates(corpus(200), w).count()
    val big = ops.Mining.linkageCandidates(corpus(2000), w).count()
    // the hard bound sorted-neighborhood guarantees at ANY block layout
    assert(small <= 200L * w, s"$small exceeds rows×window")
    assert(big <= 2000L * w, s"$big exceeds rows×window")
    // 10× the rows → ~10× the candidates (a B² self-join would be ~100×)
    val ratio = big.toDouble / small
    assert(ratio >= 8.0 && ratio <= 12.0, s"candidate growth $ratio not linear")
  }

  test("linkageCandidates: near-identical names are candidate pairs across a large block") {
    import spark.implicits._
    // two typo-twins buried in 1000 alphabetically-scattered names: the
    // sort-neighborhood must still surface the pair (they sort adjacent)
    val names = (0 until 1000).map(i => (i.toLong, f"Name$i%04d x", 1L, "AUTO")) ++
      Seq((5000L, "Zelda Quartermaine", 1L, "AUTO"), (5001L, "Zelda Quartermained", 1L, "AUTO"))
    val pairs = ops.Mining.linkageCandidates(
      names.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
      ops.Mining.LinkageWindow)
    val hit = pairs.filter((col("ka") === 5000L && col("kb") === 5001L) ||
      (col("ka") === 5001L && col("kb") === 5000L)).collect()
    assert(hit.length === 1)
    assert(hit.head.getAs[Int]("d") === 1)
  }

  test("connectedComponents: chains, isolated vertices, and label determinism") {
    import spark.implicits._
    // component {1,2,3,4} is a CHAIN (forces multi-round propagation),
    // {10,11} a pair, {20} isolated; edge direction is arbitrary
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
    // single-task union-find path (default: edge set within the bound)
    val got = ops.Cluster.connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // iterative min-label + path-halving path (forced by a zero bound)
    // must be bit-equal — the bound is a performance switch, never a
    // semantics switch
    val gotLoop = ops.Cluster.connectedComponents(edges, verts, smallGraphMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLoop === want)
  }

  test("TopKMin aggregate equals the window top-k for random inputs (property)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Seq(5, 23, 777).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(6)
      val rows = (0 until 2000).map { i =>
        // duplicate-heavy sort keys exercise the payload tie-break
        (s"g${rnd.nextInt(7)}", rnd.nextInt(50).toLong, i.toLong)
      }
      val df = rows.toDF("g", "hk", "id")
      val viaAgg = df.groupBy("g")
        .agg(graft.functions.TopKMin.topKMin(k)(col("hk"), col("id")).as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), col("col._1").as("hk"), col("col._2").as("id"),
          (col("pos") + 1).as("rk"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val w = Window.partitionBy("g").orderBy(col("hk"), col("id"))
      val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(viaAgg === viaWindow, s"seed=$seed k=$k")
    }
  }

  test("connectedComponents: both paths agree on a random graph (property)") {
    import spark.implicits._
    Seq(3, 17, 404).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nVerts = 60 + rnd.nextInt(140)
      val verts = (0 until nVerts).map(_.toLong)
      val edges = (0 until nVerts / 2).map(_ =>
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      val eDf = edges.toDF("src", "dst")
      val vDf = verts.toDF("id")
      val small = ops.Cluster.connectedComponents(eDf, vDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = ops.Cluster.connectedComponents(eDf, vDf, smallGraphMaxEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(small === loop, s"seed=$seed")
      assert(small.keySet === verts.toSet, s"seed=$seed: every vertex labeled")
    }
  }

  test("q65: exact-dup docs land in one cluster with the min doc_id canonical") {
    import spark.implicits._
    val out = ops.Cluster.q65.fn(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = out.groupBy(_._2)
    // every cluster's id is its min member and exactly that member is canonical
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.count(_._4) === 1)
      assert(members.forall(_._3 === members.length))
    }
    // every document is assigned exactly once
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === Catalog.table(spark, sf, "documents").count())
  }

  test("IVF index artifact is built once and reused by q38") {
    val path = ops.Similarity.buildIvfIndex(spark, sf)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val mtime = success.lastModified()
    // second build is a no-op (the committed artifact is reused, not rebuilt)
    ops.Similarity.buildIvfIndex(spark, sf)
    assert(success.lastModified() === mtime)
    // and the artifact holds one centroid per label, 64-dim
    val cents = spark.read.parquet(path)
    val labels = Catalog.table(spark, sf, "embeddings").select("label").distinct().count()
    assert(cents.count() === labels)
    assert(cents.select(size(col("centroid"))).head().getInt(0) === 64)
  }

  test("IVF append: half-corpus index + appended half equals the full rebuild exactly") {
    val e = Catalog.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), ops.Similarity.asDouble(col("embedding")).as("v"))
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val p1 = java.nio.file.Files.createTempDirectory("graft-ivf-inc").toString + "/idx"
    val p2 = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString + "/idx"
    ops.Similarity.writeIvfIndex(e.filter(col("vec_id") < cut), p1)
    ops.Similarity.appendIvfIndex(spark, p1, e.filter(col("vec_id") >= cut))
    ops.Similarity.writeIvfIndex(e, p2)
    val inc = spark.read.parquet(p1).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[scala.collection.Seq[Double]]("centroid"), r.getAs[Long]("n"))).toMap
    val full = spark.read.parquet(p2).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[scala.collection.Seq[Double]]("centroid"), r.getAs[Long]("n"))).toMap
    assert(inc.keySet === full.keySet)
    full.foreach { case (label, (cFull, nFull)) =>
      val (cInc, nInc) = inc(label)
      assert(nInc === nFull)
      // BIT-equal doubles: integer sums merge associatively, decode once
      assert(cInc === cFull, s"centroid for label $label must be bit-identical")
    }
  }

  test("IVF append drift trigger: in-distribution append serves on, shifted or new-cell appends trip") {
    val e = Catalog.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), ops.Similarity.asDouble(col("embedding")).as("v"))
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val half = e.filter(col("vec_id") < cut)
    val delta = e.filter(col("vec_id") >= cut)
    val labelsAll = e.select("label").distinct().count()
    assert(half.select("label").distinct().count() === labelsAll,
      "fixture: the first half must cover every cell")

    // in-distribution: centroids barely move, no new cells, keep serving
    val p1 = java.nio.file.Files.createTempDirectory("graft-ivfd-in").toString + "/idx"
    ops.Similarity.writeIvfIndex(half, p1)
    val inDist = ops.Similarity.appendIvfIndexMeasured(spark, p1, delta)
    assert(inDist.nAppended === delta.count())
    assert(inDist.nNewCells === 0L)
    assert(!inDist.rebuild,
      s"an in-distribution append must not trip the rebuild: $inDist")
    // and the measured merge wrote exactly the plain append's artifact
    val p2 = java.nio.file.Files.createTempDirectory("graft-ivfd-full").toString + "/idx"
    ops.Similarity.writeIvfIndex(e, p2)
    def cents(p: String) = spark.read.parquet(p).collect()
      .map(r => r.getAs[Int]("label") ->
        r.getAs[scala.collection.Seq[Double]]("centroid").toList).toMap
    assert(cents(p1) === cents(p2),
      "measured append must stay bit-equal to a from-scratch rebuild")

    // planted magnitude shift: centroids move past the routing gap
    val p3 = java.nio.file.Files.createTempDirectory("graft-ivfd-shift").toString + "/idx"
    ops.Similarity.writeIvfIndex(half, p3)
    val shifted = delta.select(col("vec_id"), col("label"),
      transform(col("v"), x => x * lit(10.0)).as("v"))
    val moved = ops.Similarity.appendIvfIndexMeasured(spark, p3, shifted)
    assert(moved.rebuild && moved.maxDispPct > inDist.maxDispPct,
      s"a centroid-moving append must trip: $moved vs $inDist")

    // a never-seen cell always trips, whatever the geometry
    val p4 = java.nio.file.Files.createTempDirectory("graft-ivfd-new").toString + "/idx"
    ops.Similarity.writeIvfIndex(half, p4)
    val newCell = delta.select(col("vec_id"),
      (col("label") + lit(1000)).as("label"), col("v"))
    val appeared = ops.Similarity.appendIvfIndexMeasured(spark, p4, newCell)
    assert(appeared.nNewCells > 0L && appeared.rebuild,
      s"an appeared cell must trip: $appeared")

    // the sidecar protocol is artifact-generic: IVF builds write the same
    // metadata and the measured append the same audit columns, so the
    // PQ age/decision readers work unchanged on the coarse quantizer
    val age = ops.Similarity.pqIndexAge(spark, p1)
    assert(age.trainedRows === ids.count(_ < cut) &&
      age.appendedRows === inDist.nAppended)
    val (_, ivfTrip, ivfRebuild) = ops.Similarity.pqRebuildDecision(spark, p1)
    assert(!ivfTrip && ivfRebuild,
      "doubling an IVF corpus must force the default age rebuild without a drift trip")
    val (_, shiftTrip, _) = ops.Similarity.pqRebuildDecision(spark, p3, ageThresholdPct = 10000L)
    assert(shiftTrip, "the logged displacement verdict must trip the decision")
  }

  test("PQ append: half-corpus codes + appended half equals the full rebuild exactly") {
    val e = Catalog.table(spark, sf, "embeddings")
      .select(col("vec_id"), ops.Similarity.asDouble(col("embedding")).as("v"))
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    assert(cut > ops.Similarity.PqK, "first half must contain the codebook seeds")
    val p1 = java.nio.file.Files.createTempDirectory("graft-pq-inc").toString + "/idx"
    val p2 = java.nio.file.Files.createTempDirectory("graft-pq-full").toString + "/idx"
    ops.Similarity.writePqIndex(e.filter(col("vec_id") < cut), p1)
    ops.Similarity.appendPqIndex(spark, p1, e.filter(col("vec_id") >= cut))
    ops.Similarity.writePqIndex(e, p2)
    def codeSet(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val inc = codeSet(p1)
    val full = codeSet(p2)
    assert(inc === full, "frozen-codebook append must be bit-equal to a rebuild")
    assert(inc.size === ids.length * ops.Similarity.PqM)
    // the frozen codebook is part of the artifact and identical across paths
    def cbSet(p: String) = spark.read.parquet(ops.Similarity.cbPath(p))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Double]](2).toList)).toSet
    assert(cbSet(p1) === cbSet(p2))
  }

  test("PQ append drift trigger: in-distribution append serves on, planted drift trips the rebuild") {
    val e = Catalog.table(spark, sf, "embeddings")
      .select(col("vec_id"), ops.Similarity.asDouble(col("embedding")).as("v"))
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    assert(cut > ops.Similarity.PqK)
    val half = e.filter(col("vec_id") < cut)
    val delta = e.filter(col("vec_id") >= cut)

    // in-distribution: the appended half quantizes like the trained half
    val p1 = java.nio.file.Files.createTempDirectory("graft-pqd-in").toString + "/idx"
    ops.Similarity.writePqIndex(half, p1)
    val inDist = ops.Similarity.appendPqIndexMeasured(spark, p1, delta)
    assert(inDist.nAppended === ids.length - ids.count(_ < cut))
    assert(inDist.baselineMeanErrFp > 0L)
    assert(!inDist.rebuild,
      s"an in-distribution append must keep serving the frozen codebook: $inDist")

    // the measured append writes EXACTLY the plain append's codes — the
    // drift statistic rides the encode, it never changes the artifact
    val p2 = java.nio.file.Files.createTempDirectory("graft-pqd-full").toString + "/idx"
    ops.Similarity.writePqIndex(e, p2)
    def codeSet(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(codeSet(p1) === codeSet(p2),
      "measured append must stay bit-equal to a from-scratch rebuild")

    // planted drift: the same delta scaled 3x sits far from every
    // codeword — mean quantization error explodes and the trigger fires
    val p3 = java.nio.file.Files.createTempDirectory("graft-pqd-drift").toString + "/idx"
    ops.Similarity.writePqIndex(half, p3)
    val shifted = delta.select(col("vec_id"),
      transform(col("v"), x => x * lit(3.0)).as("v"))
    val drifted = ops.Similarity.appendPqIndexMeasured(spark, p3, shifted)
    assert(drifted.rebuild,
      s"a distribution shift must trip the rebuild trigger: $drifted")
    assert(drifted.driftPct > inDist.driftPct)

    // every append leaves one audit row for the decision history
    assert(spark.read.parquet(ops.Similarity.driftAuditPath(p1)).count() === 1L)
    val audit = spark.read.parquet(ops.Similarity.driftAuditPath(p3)).head()
    assert(audit.getAs[Boolean]("rebuild") === true)
    assert(audit.getAs[Long]("n_appended") === drifted.nAppended)

    // build metadata + age: the consolidated decision reads ONLY sidecars.
    // p1 appended as many rows as it trained on -> age trips the default
    // 50% threshold even though quantization drift never did; a laxer
    // age policy keeps serving; p3's logged drift trips at any threshold
    val age1 = ops.Similarity.pqIndexAge(spark, p1)
    assert(age1.trainedRows === ids.count(_ < cut))
    assert(age1.appendedRows === inDist.nAppended)
    val (_, trip1, rebuild1) = ops.Similarity.pqRebuildDecision(spark, p1)
    assert(!trip1 && rebuild1, "age alone must force the default rebuild")
    val (_, _, lax) = ops.Similarity.pqRebuildDecision(spark, p1, ageThresholdPct = 200L)
    assert(!lax, "a lax age policy keeps serving an undrifted index")
    val (_, trip3, rebuild3) = ops.Similarity.pqRebuildDecision(spark, p3, ageThresholdPct = 10000L)
    assert(trip3 && rebuild3, "logged quantization drift must trip at any age policy")
  }

  test("PQ code artifact is built once and holds M codes per vector") {
    val path = ops.Similarity.buildPqIndex(spark, sf)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val mtime = success.lastModified()
    ops.Similarity.buildPqIndex(spark, sf)
    assert(success.lastModified() === mtime, "second build must reuse the committed artifact")
    val codes = spark.read.parquet(path)
    val vectors = Catalog.table(spark, sf, "embeddings").count()
    assert(codes.count() === vectors * ops.Similarity.PqM, "one code row per (vector, subspace)")
    assert(codes.agg(max(col("k"))).head().getLong(0) < ops.Similarity.PqK)
    assert(codes.agg(min(col("k"))).head().getLong(0) >= 0L)
  }

  test("trained residual-PQ artifact: Lloyd round strictly reduces total error, codes+sidecars frozen") {
    val path = ops.Similarity.buildTrainedResPqIndex(spark, sf)
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val mtime = success.lastModified()
    ops.Similarity.buildTrainedResPqIndex(spark, sf)
    assert(success.lastModified() === mtime, "second build must reuse the committed artifact")
    val vectors = Catalog.table(spark, sf, "embeddings").count()
    val codes = spark.read.parquet(path)
    assert(codes.count() === vectors * ops.Similarity.PqM, "one code row per (vector, subspace)")
    val errs = spark.read.parquet(ops.Similarity.errPath(path))
    assert(errs.count() === vectors, "one error row per vector")
    // Lloyd monotonicity is a TOTAL-error guarantee (assignment and
    // update steps each reduce the sum); individual vectors may get
    // worse, so only the corpus sum is pinned
    val t = errs.agg(sum(col("err_seed_fp")).as("s0"), sum(col("err_trained_fp")).as("s1")).head()
    assert(t.getLong(1) < t.getLong(0),
      "one Lloyd round must strictly reduce the corpus quantization error")
    // the frozen trained codebook travels with the codes: M*K rows
    val cb = spark.read.parquet(ops.Similarity.cbPath(path))
    assert(cb.count() === ops.Similarity.PqM.toLong * ops.Similarity.PqK)
  }

  test("MAD outlier rule resists masking where the 3-sigma rule does not") {
    import spark.implicits._
    // 0..99 plus a huge and a medium outlier: the huge one inflates the
    // stddev until the medium one hides under 3 sigma; the MAD threshold
    // does not move, so both stay flagged
    val vals = ((0 until 100).map(_.toDouble) ++ Seq(1e6, 5e4))
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("event_type", "value", "event_id")
    val med = ops.RankSelect.groupMedian(df, "event_type", "value", "event_id")
      .head().getAs[Double]("median_value")
    val dev = df.withColumn("adev", abs(col("value") - lit(med)))
    val mad = ops.RankSelect.groupMedian(
      dev.select(col("event_type"), col("adev"), col("event_id")),
      "event_type", "adev", "event_id").head().getAs[Double]("median_value")
    val madOut = dev.filter(col("adev") > lit(4.4478) * lit(mad)).count()
    val stats = df.agg(avg("value"), stddev_samp("value")).head()
    val (mu, sigma) = (stats.getDouble(0), stats.getDouble(1))
    val sigmaOut = df.filter(abs(col("value") - lit(mu)) > lit(3.0) * lit(sigma)).count()
    assert(madOut === 2L, "MAD flags both planted outliers")
    assert(sigmaOut === 1L, "the huge outlier masks the medium one under 3 sigma")
  }
}
