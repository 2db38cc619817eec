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
