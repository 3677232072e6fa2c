package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4; the 100 TB concern the local
  * bench can't show). Spark's AQE skew-join handles sort-merge cases at
  * runtime; these helpers cover the two shapes AQE doesn't: aggregation
  * skew (one reducer owns the hot group) and join-key salting when the
  * build side must replicate.
  *
  * Salt is deterministic (hash of stable columns mod S), never rand() —
  * retries and speculative tasks must produce identical rows.
  */
object Skew {

  /** Deterministic salt in [0, s) from arbitrary stable columns. */
  def saltCol(s: Int, cols: Column*): Column = pmod(hash(cols: _*), lit(s))

  /** Two-phase aggregation: partial aggregate on (keys, salt) — spreading
    * a hot key over `salt` reducers — then final combine on the keys.
    * `partial` builds the salted-level aggregates; `combine` merges them.
    * Example: count → partial count(1), combine sum; sum(x) → partial
    * sum(x), combine sum. (avg must be decomposed into sum+count by the
    * caller — the usual two-phase rule.)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      saltBy: Seq[String],
      partial: Seq[Column],
      combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(salt, saltBy.map(col): _*))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted equi-join: the big (skewed) side gets a deterministic salt from
    * its non-key columns; the small side is replicated `salt` times so
    * every (key, salt) bucket finds its match. Hot-key rows scatter over
    * `salt` reducers instead of one. Use when the small side is too big to
    * broadcast but small enough to replicate S×.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      bigSaltBy: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltCol(salt, bigSaltBy.map(col): _*))
    val replicated = small
      .withColumn("_salt", explode(array((0 until salt).map(lit(_)): _*)))
    saltedBig.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
