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

  // buffer is sorted ascending: the common full-buffer case is one
  // comparison; insertion re-sorts at most k+1 elements
  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length >= k && b.last <= a) b
    else if (b.contains(a)) b
    else ((b :+ a).sorted).take(k)

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
