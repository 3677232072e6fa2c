package graft.ops

import graft.Catalog
import graft.queries.{Det, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for a training-data pipeline over `documents`:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard
  * with shared-shingle blocking. All candidate generation is blocking-based
  * (band/bucket equi-joins — shuffle on the band key), never an O(n²)
  * cross join, so the shapes hold at 100 TB: work scales with
  * sum-of-bucket-sizes, and hot buckets are ordinary join skew that AQE
  * handles.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Catalog.table(s, dir, "documents")

  /** q30 — exact dedup: cluster by normalized-content fingerprint, keep the
    * lowest doc_id (one shuffle on the 128-bit key; at any scale this is
    * the cheapest dedup and the first pass before near-dup methods).
    */
  val q30 = Q("q30_dedup_exact",
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |  MIN(doc_id) AS keep_doc_id,
      |  COUNT(*) AS n_copies,
      |  COUNT(*) - 1 AS n_removed
      |FROM documents
      |GROUP BY 1
      |ORDER BY keep_doc_id""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .groupBy(md5(TextOps.normalized(col("text"))).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        (count(lit(1)) - 1).as("n_removed"))
      .orderBy("keep_doc_id")
  }

  // ── MinHash + LSH ─────────────────────────────────────────────────────

  val NumHashes = 64
  val BandSize = 4                      // 16 bands of 4 → catches J ≳ 0.5
  val MinhashPrime = 2147483647L        // 2^31 - 1
  /** Seeded affine hash families (a*h + b mod p) — deterministic. */
  val (hashA, hashB) = {
    val rnd = new scala.util.Random(12345)
    (Array.fill(NumHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Distinct 3-word-shingle xxhash64 set per document (short docs fall
    * back to the whole token string as one shingle).
    */
  def shingleHashes(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val shingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
    array_distinct(transform(shingles, sh => xxhash64(sh)))
  }

  /** Per-doc 64-slot MinHash signature frame: doc_id, n_shingles, sig_0..63.
    * Shape: explode distinct shingle hashes, one hash-aggregate with 64
    * partial mins — map-side combine keeps the shuffle at one row per doc.
    */
  def minhashSignatures(d: DataFrame): DataFrame = {
    val exploded = d
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
    val hp = pmod(col("h"), lit(MinhashPrime))
    val sigCols = (0 until NumHashes).map(i =>
      min(pmod(hp * hashA(i) + hashB(i), lit(MinhashPrime))).as(s"sig_$i"))
    exploded.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sigCols: _*)
  }

  /** (doc_id, band_idx, band_hash) — LSH bucketing of the signature. */
  def lshBands(sigs: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandSize).map { j =>
      val parts = (0 until BandSize).map(k => col(s"sig_${j * BandSize + k}"))
      struct(lit(j).as("band_idx"), xxhash64(concat_ws(",", parts: _*)).as("band_hash"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
  }

  /** q31 — MinHash+LSH dup candidates: per-doc signature digest and the
    * number of distinct candidate partners found via band-bucket join.
    * No SQL oracle (seeded hash families aren't expressible in ANSI SQL);
    * DedupSpec pins planted near-duplicate recall.
    */
  val q31 = Q.noOracle("q31_minhash_lsh") { (s, dir) =>
    val sigs = minhashSignatures(docs(s, dir)).cache()
    val bands = lshBands(sigs)
    val other = bands.select(col("doc_id").as("doc_b"),
      col("band_idx").as("bi"), col("band_hash").as("bh"))
    val candidates = bands
      .join(other, col("band_idx") === col("bi") && col("band_hash") === col("bh") &&
        col("doc_id") =!= col("doc_b"))
      .select("doc_id", "doc_b").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    val sigChecksum = (0 until NumHashes).map(i => col(s"sig_$i")).reduce(_ + _)
    sigs.join(candidates, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        sigChecksum.as("sig_checksum"),
        col("sig_0"), col("sig_63"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
      .orderBy("doc_id")
  }

  // ── SimHash ───────────────────────────────────────────────────────────

  /** Per-doc 64-bit SimHash over distinct token hashes: one explode + one
    * aggregate with 64 ±1 bit sums (all codegen'd), bits reassembled with
    * a bitwise OR chain.
    */
  def simhash(d: DataFrame): DataFrame = {
    val exploded = d.select(col("doc_id"),
      explode(array_distinct(transform(TextOps.tokens(col("text")), t => xxhash64(t)))).as("h"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit_$b"))
    val agg = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"), bitSums: _*)
    val sig = (0 until 64).map(b =>
      when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), col("n_tokens"), sig.as("simhash"))
  }

  /** q32 — SimHash near-dup: 4×16-bit band LSH over the signature, Hamming
    * distance ≤ 8 counts as near-duplicate. No SQL oracle; DedupSpec pins
    * behavior on planted dups.
    */
  val q32 = Q.noOracle("q32_simhash") { (s, dir) =>
    val sigs = simhash(docs(s, dir)).cache()
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band_idx"),
          shiftright(col("simhash"), k * 16).bitwiseAND(lit(0xffffL)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    val other = bands.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
      col("band_idx").as("bi"), col("band_val").as("bv"))
    val near = bands
      .join(other, col("band_idx") === col("bi") && col("band_val") === col("bv") &&
        col("doc_id") =!= col("doc_b"))
      .select(col("doc_id"), col("doc_b"),
        bit_count(col("simhash").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_candidates"),
        Det.countIf(col("hamming") <= 8).as("n_near_dups"),
        min(col("hamming")).as("min_hamming"))
    sigs.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("simhash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("min_hamming"))
      .orderBy("doc_id")
  }

  // ── n-gram Jaccard ────────────────────────────────────────────────────

  /** Exact Jaccard over shingle sets for candidate pairs found by
    * shared-shingle blocking: J = |A∩B| / (|A| + |B| - |A∩B|), where the
    * intersection size falls out of a (hash → docs) join + pair count —
    * no per-pair set materialization.
    */
  def jaccardPairs(d: DataFrame, minShared: Int = 1): DataFrame = {
    val sh = d.select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val other = sh.select(col("doc_id").as("doc_b"), col("h").as("h2"))
    val shared = sh.join(other, col("h") === col("h2") && col("doc_id") < col("doc_b"))
      .groupBy("doc_id", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    shared
      .join(sizes, Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("set_size").as("size_b")), Seq("doc_b"))
      .select(col("doc_id"), col("doc_b"), col("n_shared"), col("set_size").as("size_a"),
        col("size_b"),
        (col("n_shared").cast("double") /
          (col("set_size") + col("size_b") - col("n_shared"))).as("jaccard"))
  }

  /** q33 — per-doc best n-gram-Jaccard match (docs with no shared shingle
    * report null match, so the output is always one row per document).
    */
  val q33 = Q.noOracle("q33_ngram_jaccard") { (s, dir) =>
    val d = docs(s, dir)
    val pairs = jaccardPairs(d)
    // symmetrize so every doc sees its best partner
    val sym = pairs.select(col("doc_id"), col("doc_b"), col("jaccard"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col("doc_id").as("doc_b"), col("jaccard")))
    val w = Window.partitionBy("doc_id").orderBy(col("jaccard").desc, col("doc_b").asc)
    val best = sym.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("doc_b").as("best_match_id"),
        Det.dround(col("jaccard"), 4).as("best_jaccard"))
    d.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_match_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        (coalesce(col("best_jaccard"), lit(0.0)) >= 0.8).as("is_near_dup"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q30, q31, q32, q33)
}
