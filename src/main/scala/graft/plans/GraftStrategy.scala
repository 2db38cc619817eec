package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans graft's custom logical operators into their physical execs.
  * Injected via `GraftExtensions` (spark.sql.extensions) or, on an
  * already-built session, `spark.experimental.extraStrategies` —
  * `graft.ops.TopK.perKey` self-registers idempotently.
  *
  * TopKPerKey plans as final(partial(child)): the partial runs with the
  * child's distribution and cuts each partition to <= k rows per key;
  * EnsureRequirements then inserts the key shuffle the final's
  * ClusteredDistribution demands, so the exchange moves only survivors.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
