package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Oracle._
import graft.sources.Tables

/** The data-layout (file-skipping) tier: queries that run over a
  * range-clustered / Z-ordered copy of lineitem built by
  * [[graft.ext.Layout]] and cached per data dir through
  * [[graft.core.IndexStore]] (the d9/y7/vocab-sketch-store
  * gate-self-containment precedent — the first run pays the one-time
  * layout build, every later run reads the committed copy).
  *
  * Correctness story: a layout is CONTENT-PRESERVING — same rows,
  * different order — so each query's oracle is the identical SQL over
  * the ORIGINAL parquet table. What the layout changes is the plan's
  * scan cost: the pushed predicate prunes parquet row groups via
  * min/max footer stats, which `LayoutSpec` pins by comparing
  * records-read against a round-robin (worst-case) copy of the same
  * data. At 100 TB this is the difference between reading
  * ~selectivity of the table and reading all of it.
  */
object LayoutQueries extends QueryGroup {

  private val LayoutFiles = 16

  /** Laid-out lineitem copy, range-clustered on l_shipdate. */
  private def rangeCopy(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.IndexStore.pathFor(spark, "layout-range", dir)
    graft.ext.Layout.rangeLayout(
      Tables(spark, dir).lineitem, Seq("l_shipdate"), path, LayoutFiles)
    spark.read.parquet(path)
  }

  /** Laid-out lineitem copy, Z-ordered on (l_shipdate, l_extendedprice). */
  private def zorderCopy(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.IndexStore.pathFor(spark, "layout-zorder", dir)
    graft.ext.Layout.zorderLayout(
      Tables(spark, dir).lineitem, "l_shipdate", "l_extendedprice",
      path, LayoutFiles)
    spark.read.parquet(path)
  }

  /** Quarterly revenue off the range layout: the ~4%-selective
    * l_shipdate window prunes all but the few row groups whose
    * [min,max] shipdate intersects the quarter. */
  def layoutRange(spark: SparkSession, dir: String): DataFrame =
    rangeCopy(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
              col("l_shipdate") <  lit("1997-06-01"))
      .groupBy(col("l_returnflag"))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
             .as("revenue"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Two-dimensional band query off the Z-order layout: a ~0.7%-
    * selective (shipdate window × price band) predicate. On a
    * single-column sort only the shipdate half would prune; on the
    * Z layout each row group is a rectangle in (shipdate, price)
    * space, so BOTH halves prune. */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame =
    zorderCopy(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
              col("l_shipdate") <  lit("1997-07-01") &&
              col("l_extendedprice").between(20000, 30000))
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_layout_range"  -> (layoutRange _),
    "x_layout_zorder" -> (layoutZorder _)
  )

  def oracles: Map[String, String] = Map(
    // the layout is content-preserving, so the oracle is the same
    // query over the ORIGINAL table — equality here is exactly the
    // claim that the layout rewrote order, not content
    "x_layout_range" ->
      s"""SELECT l_returnflag,
         |  ${sqlDsumProd("l_extendedprice", "(1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
         |  AND l_shipdate <  TIMESTAMP '1997-06-01'
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,
    "x_layout_zorder" ->
      s"""SELECT l_returnflag,
         |  ${sqlDsum("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-07-01'
         |  AND l_extendedprice BETWEEN 20000 AND 30000
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
  )
}
