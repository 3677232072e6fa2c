package graft

import graft.functions.TextHash
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the fused TextHash pipeline must agree with the plain
  * lower+regex reference on arbitrary input (the OpsSpec equivalence test
  * covers the corpus; this covers the space around it).
  */
class TextHashPropSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  private def refTokens(s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile("[a-z0-9]+")
      .matcher(s.toLowerCase(java.util.Locale.ROOT))
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '-', '_', '!', '\'', '"'),
      1 -> Gen.choose(33.toChar, 126.toChar))).map(_.mkString)

  private val unicodeGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      2 -> Gen.oneOf('É', 'ß', 'İ', 'ı', 'Ω', '中', '�', 'Ⅻ'),
      1 -> Gen.choose(0x80.toChar, 0x2fff.toChar))).map(_.mkString)

  test("tokenize matches lower+regex reference on ASCII") {
    forAll(asciiGen) { s => TextHash.tokenize(s).toSeq == refTokens(s) }
  }

  test("tokenize matches lower+regex reference on non-ASCII (special casing)") {
    forAll(unicodeGen) { s => TextHash.tokenize(s).toSeq == refTokens(s) }
  }

  test("h60 is non-negative, 60-bit, and distinct across token space") {
    forAll(asciiGen) { s =>
      val h = TextHash.h60(s)
      h >= 0L && h < (1L << 60)
    }
    // pinned value so the oracle formula can never drift silently:
    // md5('abc') = 900150983cd24fb0..., first 15 hex = 0x900150983cd24fb
    assert(TextHash.h60("abc") === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  /** JVM reference for the winnowing sketch: per-window argmin over the
    * positional k-gram hashes, first-seen-distinct — the quadratic spec
    * the O(n) monotonic-deque kernel must reproduce.
    */
  private def refWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val hs = TextHash.shingleHashesAll(s, k).toSeq
    val mins =
      if (hs.length < w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq
    mins.distinct
  }

  test("winnowSketch matches the sliding-window-min reference on arbitrary text") {
    forAll(asciiGen) { s =>
      val fused = TextHash.winnowSketch(s, 3, 4).toSeq
      fused.head == TextHash.shingleHashesAll(s, 3).length &&
        fused.tail == refWinnow(s, 3, 4)
    }
  }

  test("shingleHashes: short-text fallback and n=1 token hashing") {
    assert(TextHash.shingleHashes("one two", 3).toSeq ===
      Seq(TextHash.h60("one two")))
    assert(TextHash.shingleHashes("", 3).toSeq === Seq(TextHash.h60("")))
    assert(TextHash.shingleHashes("A b a B", 1).toSeq ===
      Seq(TextHash.h60("a"), TextHash.h60("b")), "distinct, first-seen order")
    assert(TextHash.tokenHashes("A b a").toSeq ===
      Seq(TextHash.h60("a"), TextHash.h60("b"), TextHash.h60("a")), "non-distinct")
  }

  test("featureHashVec matches the per-dimension count-difference reference on arbitrary text") {
    def ref(s: String, dim: Int): Seq[Double] = {
      val hs = refTokens(s).map(TextHash.h60)
      (0 until dim).map(d =>
        (hs.count(h => h % dim == d && ((h >> 6) & 1L) == 1L) -
          hs.count(h => h % dim == d && ((h >> 6) & 1L) == 0L)).toDouble)
    }
    forAll(asciiGen) { s => TextHash.featureHashVec(s, 64).toSeq == ref(s, 64) }
    forAll(unicodeGen) { s => TextHash.featureHashVec(s, 64).toSeq == ref(s, 64) }
    // sanity anchors: sign and dimension routing per h60 definition
    assert(TextHash.featureHashVec("", 64).forall(_ == 0.0))
    val h = TextHash.h60("token")
    val v = TextHash.featureHashVec("token", 64)
    assert(v((h % 64).toInt) === (if (((h >> 6) & 1L) == 1L) 1.0 else -1.0))
  }
}
