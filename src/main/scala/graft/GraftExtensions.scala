package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injector (SURVEY §2.9 / the preferred extension
  * point): makes every graft custom expression available to plain
  * `spark.sql(...)` in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — no manual
  * registry calls. Parity needs no custom rules or strategies (SURVEY §4),
  * so functions are the only injection this engine requires; the same
  * class is where a Rule[LogicalPlan] or SparkStrategy would be injected
  * if one ever became necessary.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - mod-p polynomial rolling hash"),
      exprs => RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold dot product of double arrays"),
      exprs => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - distinct n-gram h60 hashes"),
      exprs => ShingleHashes(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("token_hashes"),
      info("token_hashes", "token_hashes(text) - all token h60 hashes"),
      exprs => TokenHashes(exprs.head)))
    ext.injectFunction((FunctionIdentifier("feature_hash_vec"),
      info("feature_hash_vec", "feature_hash_vec(text, dim) - signed-count hashing-trick embedding"),
      exprs => FeatureHashVec(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("double_bits"),
      info("double_bits", "double_bits(x) - raw IEEE-754 bits of a double as BIGINT"),
      exprs => DoubleBits.withCast(exprs.head)))
    ext.injectFunction((FunctionIdentifier("bpe_merge"),
      info("bpe_merge", "bpe_merge(tokens, a, b) - one left-to-right BPE merge round"),
      exprs => BpeMerge(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("bitmap_distinct"),
      info("bitmap_distinct", "bitmap_distinct(id, maxId) - exact distinct via bitmap agg"),
      exprs => BitmapDistinct(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
  }
}
