package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers

/** Bridge into `private[sql]` expression helpers (see PlanBridge for the
  * plan-level analog). */
object ExprBridge {
  /** Spark's canonical float/double normalization (-0.0 -> 0.0, all NaN
    * bit patterns -> the canonical NaN), recursively through arrays and
    * structs. Grouping keys hashed as raw UnsafeRow bytes MUST be wrapped
    * with this or equal keys can land in different hash buckets; Spark's
    * own aggregates/joins get it from the NormalizeFloatingNumbers
    * optimizer rule, which does not know about custom plan nodes. Returns
    * the expression unchanged when its type contains no floating point. */
  def normalizeFloat(e: Expression): Expression = NormalizeFloatingNumbers.normalize(e)
}
