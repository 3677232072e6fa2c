package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) sketch build: the k smallest DISTINCT values of
  * a hash column, as a partial-merge aggregate.
  *
  * TopKMin's shape (map-side k-bounded buffers, O(groups × k × partitions)
  * on the wire) plus dedup, because KMV's estimator is defined on the
  * order statistics of the distinct hash set: duplicates of a hot key must
  * not crowd the buffer. One pass, no pre-DISTINCT shuffle — at 100 TB the
  * corpus reduces map-side to ≤ k values per (partition, group).
  *
  * The result is exact order statistics of h(keys) — deterministic, so
  * KMV estimates (unlike sampled sketches) carry full DuckDB oracles.
  */
case class KmvMin(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  def zero: Seq[Long] = Vector.empty

  // buffer is sorted ascending: the common full-buffer reject is one
  // comparison; an accepted value binary-searches its slot (O(log k)
  // compare + one O(k) splice), with the same search detecting duplicates
  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length >= k && b.last <= a) b
    else {
      val v = b.toIndexedSeq
      var lo = 0
      var hi = v.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < a) lo = mid + 1 else hi = mid
      }
      if (lo < v.length && v(lo) == a) b
      else {
        val ins = (v.take(lo) :+ a) ++ v.drop(lo)
        if (ins.length > k) ins.take(k) else ins
      }
    }

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  def finish(r: Seq[Long]): Seq[Long] = r

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvMin {
  /** Column form: ascending array of the group's k smallest distinct
    * values of `hash`.
    */
  def kmvMin(k: Int)(hash: Column): Column =
    udaf(KmvMin(k), Encoders.scalaLong).apply(hash)
}
