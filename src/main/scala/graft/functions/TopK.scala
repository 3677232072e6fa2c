package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a partial-merge aggregate.
  *
  * The window form — `row_number() OVER (PARTITION BY g ORDER BY key)`
  * then `<= k` — shuffles EVERY row to its group's partition and sorts
  * whole groups just to discard all but k rows. This Aggregator keeps a
  * k-bounded sorted buffer, so map-side partial aggregation reduces each
  * (input partition, group) to at most k pairs BEFORE the shuffle: bytes
  * on the wire drop from O(n) to O(groups × k × partitions), and no task
  * ever sorts more than k elements at once — the same
  * keep-only-what-can-win idea as TakeOrdered, applied per group. At
  * 100 TB with high-cardinality groups this is the difference between
  * shuffling the corpus and shuffling a bounded digest.
  *
  * Input is a (sortKey, payload) pair; the result is the k
  * lexicographically-smallest pairs in ascending order (ties on sortKey
  * broken by payload, so the output is total-order deterministic).
  */
case class TopKMin(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, "k must be >= 1")
  private val ord = implicitly[Ordering[(Long, Long)]]

  def zero: Seq[(Long, Long)] = Vector.empty

  // buffers are kept sorted, so the common full-buffer case is a single
  // comparison against the current k-th best
  def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.length >= k && ord.lteq(b.last, a)) b
    else ((b :+ a).sorted(ord)).take(k)

  def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (b1 ++ b2).sorted(ord).take(k)

  def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopKMin {
  /** Column form: `topKMin(5)(col("hk"), col("doc_id"))` returns the
    * array of the group's 5 smallest (hk, doc_id) structs, ascending.
    */
  def topKMin(k: Int)(sortKey: Column, payload: Column): Column =
    udaf(TopKMin(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(sortKey, payload)
}
