package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the classic per-key top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W.partitionBy(k).orderBy(o)))
  *       .filter($"rn" <= k).drop("rn") }}}
  *
  * compiles to Window → Filter → Project — a full sort of every key
  * partition just to keep k rows. When the rank column is used ONLY in
  * the `<= k` filter and dropped afterwards, the whole subtree is
  * semantically `TopKPerKey(keys, order, k)`, so this rule rewrites it
  * to graft's bounded-heap operator (partial/final execs, no sort).
  *
  * Deliberately conservative — it fires only when:
  *   - the Window computes exactly ONE expression: `row_number()` over
  *     (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), the frame the
  *     analyzer assigns it
  *   - the Filter is `rn <= lit` / `rn < lit` / `lit >= rn` / `lit > rn`
  *     on that attribute, k >= 1
  *   - the Project above drops the rank attribute (no other consumer
  *     can exist: between Filter and Window the attribute is only in
  *     scope here)
  *
  * `row_number` over a non-total order is nondeterministic at the k
  * boundary; the rewrite preserves the result DISTRIBUTION exactly and
  * the concrete row choice matches whenever the order is total — the
  * same contract the window form itself offers.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** Filter predicate shapes meaning `rank <= k`. */
  private def rankBound(cond: Expression): Option[(Attribute, Long)] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k.toLong))
    case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k.toLong - 1))
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k.toLong))
    case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k.toLong - 1))
    case _ => None
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      // both bounds matter: a long below Int.MinValue would wrap in toInt
      // and could turn an always-false filter into a positive k
      case Literal(v: Long, org.apache.spark.sql.types.LongType)
          if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  private def isRowNumberWindow(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber,
      WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => true
    case _ => false
  }

  /** Kill switch: `SET spark.graft.topk.rewriteEnabled=false` restores
    * the stock window plan (e.g. to compare, or if a workload prefers
    * Spark's spillable WindowExec over the bounded-heap operator). */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.rewriteEnabled", "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(we), partitionSpec, orderSpec, wChild, _)))
        if isRowNumberWindow(we) =>
      rankBound(cond) match {
        case Some((rnAttr, k))
            if k >= 1 && k <= Int.MaxValue &&
              rnAttr.exprId == we.exprId &&
              !projectList.exists(_.references.contains(rnAttr)) &&
              partitionSpec.nonEmpty =>
          Project(projectList,
            TopKPerKey(partitionSpec, orderSpec, k.toInt, wChild))
        case _ => p
      }
  }
}
