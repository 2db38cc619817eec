package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the greatest right-side event
  * time <= the left row's time, per key.
  *
  * Implementation is the scalable union-sort-window form (composition of
  * built-ins per the custom-operator preference order — no custom
  * SparkPlan needed): union both sides tagged, one shuffle+sort per key
  * by (t, rightFirst), and a running max of the right-side time. Cost is
  * one Exchange + in-partition sort over |L|+|R| — same asymptotics as a
  * sort-merge join, with no per-row probing. Equal timestamps resolve
  * right-before-left, matching ASOF `<=` semantics.
  */
object AsOf {

  /** Temporal-table join (Flink's `FOR SYSTEM_TIME AS OF` over an
    * append-only history): attach to each left row the whole LATEST
    * right row with rts <= lts per key, as a struct column `outCol`
    * (null when no right row precedes). Same union-sort-window shape
    * as [[lastRightTs]] — one shuffle of |L|+|R| keyed rows, an
    * in-partition sort, and a running `last(ignoreNulls)` carrying the
    * packed payload; no per-row probing, no range join. Right rows at
    * the same (key, ts) resolve by `rightTieCol` ascending — the last
    * one in frame order wins, so the tiebreak is deterministic at any
    * partitioning; equal timestamps across sides resolve
    * right-before-left (`<=` semantics), matching [[lastRightTs]]. */
  def lastRightRow(left: DataFrame, right: DataFrame, key: String,
                   ltsCol: String, rtsCol: String, rightTieCol: String,
                   outCol: String, leftCols: Seq[String],
                   rightCols: Seq[String]): DataFrame = {
    val payloadT = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
    val rRows = right.select(Seq(
      col(key), col(rtsCol).as("__t"), col(rightTieCol).as("__tie"),
      struct(rightCols.map(col): _*).as("__p"), lit(1).as("__isR")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lRows = left.select(Seq(
      col(key), col(ltsCol).as("__t"),
      lit(null).cast(right.schema(rightTieCol).dataType).as("__tie"),
      lit(null).cast(payloadT).as("__p"), lit(0).as("__isR")) ++
      leftCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__isR").desc, col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rRows.unionByName(lRows)
      .withColumn(outCol, last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(col(key) +: leftCols.map(col) :+ col(outCol): _*)
  }

  /** For each left row, compute `outCol` = max right `rtsCol` with
    * rts <= lts for the same `key`. Left rows with no prior right row
    * get null. `leftCols` are carried through. */
  def lastRightTs(left: DataFrame, right: DataFrame, key: String,
                  ltsCol: String, rtsCol: String, outCol: String,
                  leftCols: Seq[String]): DataFrame = {
    val rCols = Seq(col(key), col(rtsCol).as("__t"), col(rtsCol).as("__v"),
      lit(1).as("__isR")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val lCols = Seq(col(key), col(ltsCol).as("__t"),
      lit(null).cast(right.schema(rtsCol).dataType).as("__v"),
      lit(0).as("__isR")) ++ leftCols.map(col)
    val r = right.select(rCols: _*)
    val l = left.select(lCols: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(outCol, max(col("__v")).over(w))
      .filter(col("__isR") === 0)
      .select(col(key) +: leftCols.map(col) :+ col(outCol): _*)
  }
}
