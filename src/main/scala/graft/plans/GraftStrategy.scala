package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ExprBridge

/** Plans graft's custom logical operators into their physical execs.
  * Injected via `GraftExtensions` (spark.sql.extensions) or, on an
  * already-built session, `spark.experimental.extraStrategies` —
  * `graft.ops.TopK.perKey` self-registers idempotently.
  *
  * TopKPerKey plans as final(partial(child)): the partial runs with the
  * child's distribution and cuts each partition to <= k rows per key;
  * EnsureRequirements then inserts the key shuffle (and survivor-only
  * key sort) the final's requirements demand, so the exchange moves only
  * survivors.
  *
  * Keys are wrapped with Spark's float normalization here: the custom
  * node is invisible to the NormalizeFloatingNumbers optimizer rule, so
  * without this -0.0 vs 0.0 (or differing NaN bit patterns) in a
  * float/double key would hash/compare as distinct groups and diverge
  * from the Window form this operator replaces.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val nkeys = keys.map(ExprBridge.normalizeFloat)
      TopKPerKeyExec(nkeys, order, k, partial = false,
        TopKPerKeyExec(nkeys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
