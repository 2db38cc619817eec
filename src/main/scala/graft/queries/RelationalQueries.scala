package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Oracle._

/** Relational query suite. The reference has no joins/sorts/top-k
  * (SURVEY.md §2.8); these exercise the extended relational surface the
  * Spark engine provides natively: hash aggregation, broadcast + shuffle
  * joins, top-k, distinct aggregation, window ranking.
  *
  * Scale notes:
  *  - Dimension tables (region/nation/customer/supplier/part) are orders
  *    of magnitude smaller than fact tables -> always `broadcast()` them;
  *    the only shuffles left are the fact-side aggregations.
  *  - Filters are plain column predicates on the scan -> parquet pushdown.
  */
object RelationalQueries extends QueryGroup {

  /** TPC-H Q1-style pricing summary (pure scan + hash agg, no join).
    * Partial aggregation (map-side combine) makes this shuffle ~K rows
    * per partition regardless of input size. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsumProd("l_extendedprice", "(1 - l_discount)")} AS sum_disc_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql
  )
}
