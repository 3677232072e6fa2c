package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column functions (SURVEY §2.4). */
object Functions {

  /** dbt_utils.generate_surrogate_key semantics (dbt_utils 1.3.3,
    * reference package-lock.yml:2-4; SURVEY F16): md5 of '-'-joined,
    * null-safe, string-cast fields. coalesce happens BEFORE concat_ws
    * because concat_ws silently skips nulls.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-",
      cols.map(c => coalesce(c.cast("string"), lit("_dbt_utils_surrogate_key_null_"))): _*))

  /** Conditional 0/1 count — `sum(case when b then 1 else 0 end)` (SURVEY A5). */
  def countIf(cond: Column): Column = sum(when(cond, 1).otherwise(0))
}
