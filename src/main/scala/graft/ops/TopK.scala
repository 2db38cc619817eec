package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.graftbridge.PlanBridge
import graft.plans.{GraftStrategy, TopKPerKey}

/** Column-API entry point for the per-key top-k operator
  * (graft.plans.TopKPerKey — bounded heaps instead of a rank window's
  * full partition sort).
  *
  * Keys and order are column NAMES resolved against the input's
  * analyzed output (computed sort keys: add them with `withColumn`
  * first). Converting `Column` sort expressions directly is a trap:
  * Spark 4's lazy ColumnNodeExpression wrappers only convert when the
  * surrounding tree passes through the Column API, and embedded in a
  * custom logical node they survive to execution and fail task
  * serialization. Name-based resolution sidesteps the wrapper entirely.
  */
object TopK {

  /** Top `k` rows per key group. `order` is (columnName, descending)
    * pairs; ties MUST be broken by a unique column for deterministic
    * results, and ordering columns should be non-null (engines disagree
    * on default null placement). Output rows are unordered within a
    * key — add a presentation `orderBy` if needed. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    // idempotent self-registration so the operator works on sessions
    // built without spark.sql.extensions=graft.GraftExtensions;
    // synchronized: extraStrategies is a read-modify-write on shared
    // session state
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(GraftStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GraftStrategy
    }
    val child = PlanBridge.logicalPlan(df)
    // resolve with the OWNING session's resolver (case-insensitive by
    // default, matching df.col) and reject ambiguity instead of
    // first-match. df.sparkSession, not the thread-local SQLConf.get:
    // the active session on this thread may be a different session with
    // a different case-sensitivity setting
    val resolver = spark.sessionState.conf.resolver
    def attr(name: String): Attribute =
      child.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"TopK.perKey: no column '$name' in [${child.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"TopK.perKey: ambiguous column '$name' matches [${many.map(_.name).mkString(", ")}]")
      }
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    PlanBridge.ofRows(spark,
      TopKPerKey(keys.map(attr), sortOrders, k, child))
  }
}
