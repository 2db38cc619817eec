package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed aggregation primitives (SURVEY.md §2.4).
  *
  * The reference's `keyBy(...).sum(...)` without a window is a rolling
  * per-key running aggregate (WindowWordCount.java:20-23). In batch that
  * is a window-function running sum; in streaming it's an update-mode
  * grouped aggregate (graft.streaming.RollingAgg).
  *
  * Scale notes:
  *  - Running aggregates partition by key -> one shuffle on the key, then
  *    an in-partition sort; no global sort.
  *  - Tumbling/sliding buckets are pure integer expressions on the event
  *    time -> computed at scan time, aggregated with partial aggregation;
  *    a sliding window of length L with slide S duplicates each row L/S
  *    times *after* the scan (projection, not extra IO).
  */
object Aggregates {

  /** Window spec for a running per-key aggregate in arrival order (A2
    * batch analog). `orderCols` must be a deterministic total order
    * within the key. */
  def runningWindow(key: Column, orderCols: Column*) =
    Window.partitionBy(key).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Start of the tumbling window (length `sizeUs` µs) containing `tsUs`.
    * Pure integer math — identical in Spark and DuckDB. */
  def tumbleStartUs(tsUs: Column, sizeUs: Long): Column =
    (tsUs - (tsUs % sizeUs)).cast("long")

  /** All starts of sliding windows (length `sizeUs`, slide `slideUs`)
    * containing `tsUs`, as an exploded column. A row belongs to
    * size/slide consecutive windows. */
  def slideStartsUs(tsUs: Column, sizeUs: Long, slideUs: Long): Column = {
    require(sizeUs % slideUs == 0,
      s"window size ($sizeUs) must be a multiple of slide ($slideUs); " +
        "otherwise rows near the trailing edge lose a window")
    val n = (sizeUs / slideUs).toInt
    val base = tsUs - (tsUs % slideUs)
    explode(array((0 until n).map(k => base - lit(k * slideUs)): _*))
  }
}
