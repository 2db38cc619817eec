package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductLong, FirstEventAfter, L2DistanceLong,
  RollingHash, SnapVecLong}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT rolling_hash(x)")`
  * works alongside the Column API.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => RollingHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      exprs => DotProductLong(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("snap_vec"),
      new ExpressionInfo(classOf[SnapVecLong].getName, "snap_vec"),
      exprs => SnapVecLong(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("l2_long"),
      new ExpressionInfo(classOf[L2DistanceLong].getName, "l2_long"),
      exprs => L2DistanceLong(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("first_event_after"),
      new ExpressionInfo(classOf[FirstEventAfter].getName, "first_event_after"),
      exprs => FirstEventAfter(exprs(0), exprs(1), exprs(2))))
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    // rank-filter idiom -> TopKPerKey (the strategy above plans it)
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}
