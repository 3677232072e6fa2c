package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two custom scale kernels — PrefixSum and
  * RankSelect — over RANDOM inputs (sizes, value distributions, bucket
  * counts). The ScaleOpsSpec equality tests cover curated fixtures; this
  * covers the space around them: duplicates-heavy values, negative
  * values, single-element groups, bucket counts from 1 to way-past-n.
  */
class ScaleKernelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import spark.implicits._

  private val seeds = Seq(1, 7, 42, 1001, 99999)

  test("PrefixSum.runningTotal equals the sequential scan for random inputs") {
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(2000)
      val nBuckets = 1 + rnd.nextInt(300)
      // unique integral keys (the documented contract), possibly negative
      val keys = rnd.shuffle((0 until n).map(i => i.toLong * 3 - n))
      val rows = keys.map(k => (k, rnd.nextInt(2001).toLong - 1000L))
      val expected = rows.sortBy(_._1)
        .scanLeft(0L)(_ + _._2).tail // sequential running totals in key order
      val got = graft.exec.PrefixSum
        .runningTotal(rows.toDF("k", "v"), "k", "v", "cum", nBuckets)
        .orderBy("k").select("cum").as[Long].collect().toSeq
      assert(got === expected, s"seed=$seed n=$n buckets=$nBuckets")
    }
  }

  test("Mining.renormSegments tiles cycles/slots exactly for random masses") {
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nSrc = 1 + rnd.nextInt(12)
      val masses = (0 until nSrc).map { i =>
        (f"s${rnd.nextInt(1000)}%03d_$i", 1L + rnd.nextInt(9), 1L + rnd.nextInt(200)) }
      val segs = graft.ops.Mining.renormSegments(masses)
      val cMax = masses.map { case (_, w, n) => (n + w - 1) / w }.max
      // segments tile [0, cMax) and slot bases chain
      assert(segs.head.b === 0L && segs.last.e === cMax, s"seed=$seed")
      segs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.e === b.b, s"seed=$seed: cycle gap between segments")
          assert(a.base + (a.e - a.b) * a.lenCycle === b.base,
            s"seed=$seed: slot base mismatch")
          assert(a.nActive >= b.nActive, s"seed=$seed: active count grew")
        case _ => ()
      }
      // total slot mass = total docs (the dense-cover invariant)
      val totalSlots = segs.map(sg => (sg.e - sg.b) * sg.lenCycle).sum
      assert(totalSlots === masses.map(_._3).sum, s"seed=$seed")
      // inside each segment, offsets are the exclusive prefix of the
      // per-cycle emit counts clamp(n - b*w, 0, w) in source order
      segs.foreach { sg =>
        var acc = 0L
        masses.sortBy(_._1).zip(sg.off).foreach { case ((src, w, n), (osrc, o)) =>
          assert(src === osrc && o === acc, s"seed=$seed seg=${sg.idx}")
          acc += math.min(w, math.max(n - sg.b * w, 0L))
        }
        assert(acc === sg.lenCycle, s"seed=$seed seg=${sg.idx}")
      }
    }
  }

  test("Mining.renormSegments/renormManifestDf serve an empty schedule for an empty store") {
    assert(graft.ops.Mining.renormSegments(Seq.empty) === Seq.empty)
    assert(graft.ops.Mining.renormManifestDf(spark, Seq.empty).count() === 0L)
  }

  test("Mining.renormSlotsOf equals the sequential round-robin for random uneven corpora") {
    seeds.take(3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nSrc = 2 + rnd.nextInt(6)
      val masses = (0 until nSrc).map { i =>
        (f"s$i%02d", 1L + rnd.nextInt(4), 1L + rnd.nextInt(60)) }
      val rows = masses.flatMap { case (src, w, n) =>
        (0 until n.toInt).map(j => (src, (j * 7 + 1).toLong, w)) }
      val got = graft.ops.Mining
        .renormSlotsOf(spark, rows.toDF("source", "doc_id", "w"))
        .select("source", "doc_id", "slot").collect()
        .map(r => r.getLong(2) -> ((r.getString(0), r.getLong(1)))).toMap
      // sequential weighted round-robin with removal
      val qs = scala.collection.mutable.LinkedHashMap(
        masses.sortBy(_._1).map { case (src, _, n) =>
          src -> scala.collection.mutable.Queue((0 until n.toInt).map(j => (j * 7 + 1).toLong): _*)
        }: _*)
      val wOf = masses.map { case (src, w, _) => src -> w }.toMap
      val order = Seq.newBuilder[(String, Long)]
      var active = qs.keys.toSeq.sorted
      while (active.nonEmpty) {
        active.foreach { src =>
          (0L until wOf(src)).foreach { _ =>
            if (qs(src).nonEmpty) order += (src -> qs(src).dequeue()) }
        }
        active = active.filter(qs(_).nonEmpty)
      }
      val expected = order.result().zipWithIndex.map { case (sd, i) => i.toLong -> sd }.toMap
      assert(got === expected, s"seed=$seed masses=$masses")
    }
  }

  test("Mining.loaderChainPacks equals a sequential end-to-end simulation on random corpora") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    seeds.take(3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nSrc = 2 + rnd.nextInt(6)
      val corpus = (0 until nSrc).flatMap { i =>
        val src = s"src$i"
        (0 until (5 + rnd.nextInt(40))).map { j =>
          (src, (j * 3 + 11).toLong, (1 + rnd.nextInt(300)).toLong) }
      }
      def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("pack_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_starting"),
          r.getAs[Long]("n_wrapped_in"), r.getAs[Long]("pack_tokens"),
          r.getAs[Long]("n_sources"), r.getAs[Long]("n_upsampled"),
          r.getAs[Long]("first_slot"), r.getAs[Long]("last_slot")))
      val got = graft.ops.Mining
        .loaderChainPacks(spark, corpus.toDF("source", "doc_id", "toks"))
        .collect().map(key).toMap

      // ── sequential simulation, same IEEE float tree ──
      val stats = corpus.groupBy(_._1).view.mapValues(g =>
        (g.size.toLong, g.map(_._3).sum)).toMap
      val sortedSrc = stats.keys.toSeq.sorted
      val total = sortedSrc.foldLeft(0.0)((acc, s) =>
        acc + math.sqrt(stats(s)._2.toDouble))
      val copiesOf: Map[(String, Long), Long] = corpus.map { case (src, id, _) =>
        val m = stats(src)._2
        val x = math.sqrt(m.toDouble) / total * 1000000.0 / m.toDouble
        val rep = math.floor(x).toLong
        val fracBp = math.floor(x * 10000.0).toLong - rep * 10000L
        (src, id) -> (rep + (if (h60(s"up:$src:$id") % 10000 < fracBp) 1L else 0L))
      }.toMap
      // per-source queues of (doc_id, copy_idx, toks), round-robin with removal
      val queues = scala.collection.mutable.LinkedHashMap(sortedSrc.map { src =>
        src -> scala.collection.mutable.Queue(
          corpus.filter(_._1 == src).sortBy(_._2).flatMap { case (_, id, t) =>
            (1L to copiesOf((src, id))).map(ci => (id, ci, t)) }: _*)
      }: _*)
      val wOf = sortedSrc.map(s => s -> (s.drop(3).toInt % 4 + 1)).toMap
      val order = Seq.newBuilder[(String, Long, Long, Long)]
      var active = sortedSrc.filter(queues(_).nonEmpty)
      while (active.nonEmpty) {
        active.foreach { src =>
          (0 until wOf(src)).foreach { _ =>
            if (queues(src).nonEmpty) {
              val (id, ci, t) = queues(src).dequeue()
              order += ((src, id, ci, t))
            } }
        }
        active = active.filter(queues(_).nonEmpty)
      }
      // packs over the ordered token stream
      case class Acc(var nRows: Long = 0, var nStart: Long = 0, var nWrap: Long = 0,
        var tokens: Long = 0, val srcs: scala.collection.mutable.Set[String] = scala.collection.mutable.Set(),
        var nUp: Long = 0, var firstSlot: Long = Long.MaxValue, var lastSlot: Long = Long.MinValue)
      val packs = scala.collection.mutable.Map[Long, Acc]()
      var cum = 0L
      order.result().zipWithIndex.foreach { case ((src, _, ci, t), slot) =>
        if (t > 0) {
          val (st, en) = (cum, cum + t)
          (st / 2048 to (en - 1) / 2048).foreach { p =>
            val a = packs.getOrElseUpdate(p, Acc())
            a.nRows += 1
            if (st >= p * 2048) a.nStart += 1 else a.nWrap += 1
            a.tokens += math.min(en, (p + 1) * 2048) - math.max(st, p * 2048)
            a.srcs += src
            if (ci > 1) a.nUp += 1
            a.firstSlot = math.min(a.firstSlot, slot.toLong)
            a.lastSlot = math.max(a.lastSlot, slot.toLong)
          }
        }
        cum += t
      }
      val expected = packs.map { case (p, a) =>
        p -> ((a.nRows, a.nStart, a.nWrap, a.tokens, a.srcs.size.toLong,
          a.nUp, a.firstSlot, a.lastSlot)) }.toMap
      assert(got === expected, s"seed=$seed nSrc=$nSrc rows=${order.result().size}")
    }
  }

  test("RankSelect.groupQuantiles equals the sorted-element pick for random inputs") {
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val groups = 1 + rnd.nextInt(4)
      val rows = (0 until 1 + rnd.nextInt(3000)).map { i =>
        val g = s"g${rnd.nextInt(groups)}"
        // duplicates-heavy, negative-capable distribution
        val v = (rnd.nextInt(41) - 20).toDouble / (1 + rnd.nextInt(4))
        (g, v, i.toLong)
      }
      // BOTH execution paths must equal the naive pick: the sort-scan
      // small path (default) and the histogram/window path
      // (smallMaxRows = 0 forces it) — the switch is never semantic
      def run(smallMax: Long) = graft.ops.RankSelect
        .groupQuantiles(rows.toDF("g", "v", "id"), "g", "v", "id", qs,
          smallMaxRows = smallMax)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val expected = rows.groupBy(_._1).map { case (g, grp) =>
        val sorted = grp.map(v => (v._2, v._3)).sortBy(identity).map(_._1)
        def pick(p: Double) = sorted(math.floor((sorted.length - 1) * p).toInt)
        g -> ((pick(0.25), pick(0.5), pick(0.9)))
      }
      assert(run(8L << 20) === expected, s"seed=$seed (small path)")
      assert(run(0L) === expected, s"seed=$seed (histogram path)")
    }
  }

  test("RankSelect refinement: 99%-one-value skew never exceeds the bucket sort bound") {
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
    val bound = 500L
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // 99% of rows share ONE value (plus a handful of its closest double
      // neighbors, which share its 12-bit radix bucket at every level
      // until ~full precision), 1% spread wide — the pathological case
      // where the single-histogram form would sort the whole corpus in
      // one task.
      val heavy = 37.25 + rnd.nextInt(100)
      val rows = (0 until 20000).map { i =>
        val v =
          if (i % 100 == 0) (rnd.nextInt(4001) - 2000).toDouble / 3
          else if (i % 17 == 0) heavy + (i % 5) * java.lang.Math.ulp(heavy)
          else heavy
        (s"g${i % 2}", v, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      // every located target is either within the sort bound or resolved
      // EXACTLY from its full 64-bit prefix (single distinct value — no
      // sort at all)
      val targets = graft.ops.RankSelect.locateTargets(df, "g", "v", qs, bound)
      assert(targets.nonEmpty)
      targets.foreach { t =>
        assert(t.occ <= bound || t.bits == 64,
          s"seed=$seed target $t: oversized bucket survived refinement")
      }
      assert(targets.exists(_.bits > 12),
        s"seed=$seed: the heavy value must force at least one refinement round")
      // and the refined answer still equals the naive sorted-element pick
      // (smallMaxRows = 0 keeps this on the histogram/refinement path)
      val got = graft.ops.RankSelect
        .groupQuantiles(df, "g", "v", "id", qs, maxBucketRows = bound,
          smallMaxRows = 0L)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val expected = rows.groupBy(_._1).map { case (g, grp) =>
        val sorted = grp.map(v => (v._2, v._3)).sortBy(identity).map(_._1)
        def pick(p: Double) = sorted(math.floor((sorted.length - 1) * p).toInt)
        g -> ((pick(0.25), pick(0.5), pick(0.99)))
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("PrefixSum.runningTotalBy equals the sequential per-group scan for random inputs") {
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(2000)
      val nBuckets = 1 + rnd.nextInt(300)
      val groups = 1 + rnd.nextInt(6)
      // unique integral keys per row (the contract), possibly negative;
      // group sizes wildly uneven (group 0 takes half)
      val keys = rnd.shuffle((0 until n).map(i => i.toLong * 3 - n))
      val rows = keys.map { k =>
        val g = if (rnd.nextBoolean()) "g0" else s"g${rnd.nextInt(groups)}"
        (g, k, rnd.nextInt(2001).toLong - 1000L)
      }
      val expected = rows.groupBy(_._1).flatMap { case (g, grp) =>
        grp.sortBy(_._2).scanLeft((g, 0L, 0L)) { case ((_, _, acc), (_, k, v)) =>
          (g, k, acc + v)
        }.tail.map { case (_, k, cum) => (g, k) -> cum }
      }
      val got = graft.exec.PrefixSum
        .runningTotalBy(rows.toDF("g", "k", "v"), "g", "k", "v", "cum", nBuckets)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("cum")).toMap
      assert(got === expected, s"seed=$seed n=$n buckets=$nBuckets groups=$groups")
    }
  }

  test("PrefixSum.globalRank equals the sequential total-order rank for random inputs") {
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(2000)
      val nBucketVals = 1 + rnd.nextInt(40)
      // bucket ids sparse and possibly negative; order keys duplicate-heavy
      // with the unique id as final tie-break
      val rows = (0 until n).map { i =>
        (rnd.nextInt(nBucketVals).toLong * 7 - 50, rnd.nextInt(20).toLong, i.toLong)
      }
      val expected = rows.sortBy(t => (t._1, t._2, t._3)).zipWithIndex
        .map { case ((_, _, id), idx) => id -> (idx + 1).toLong }.toMap
      val got = graft.exec.PrefixSum
        .globalRank(rows.toDF("b", "k", "id"), "b", Seq("k", "id"), "r")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r")).toMap
      assert(got === expected, s"seed=$seed n=$n buckets=$nBucketVals")
    }
  }
}
