package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured decision: `spark.sql.parquet.aggregatePushdown` answers
  * bare MIN/MAX/COUNT from row-group footer metadata without reading
  * data pages — but only for unfiltered, un-grouped scans over
  * non-nested columns. Prices the gap at replica scale so the
  * session default is a recorded choice, not a guess.
  * Usage: ProbeAggPushdown <dirWithLineitem>
  */
object ProbeAggPushdown {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median3(f: => Unit): Double =
      (1 to 3).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }.sorted.apply(1)

    def run(on: Boolean): (Double, Double, String) = {
      // aggregate pushdown exists only on the DSv2 read path — parquet
      // defaults to V1 via useV1SourceList, so flipping the flag alone
      // is a silent no-op (measured: plan unchanged). The probe prices
      // the real V2+flag configuration against the V1 default.
      spark.conf.set("spark.sql.parquet.aggregatePushdown", on.toString)
      spark.conf.set("spark.sql.sources.useV1SourceList",
        if (on) "" else "avro,csv,json,kafka,orc,parquet,text")
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val bare = median3 {
        li.agg(count(lit(1)), min("l_extendedprice"),
               max("l_extendedprice")).head()
      }
      // the shape pushdown canNOT serve: a filter forces data pages
      val filtered = median3 {
        li.filter(col("l_quantity") > 0)
          .agg(min("l_extendedprice")).head()
      }
      val plan = li.agg(count(lit(1)), min("l_extendedprice"))
        .queryExecution.executedPlan.toString
      val pushed = if (plan.contains("count(*)")) "yes" else "no"
      (bare, filtered, pushed)
    }

    val (offBare, offFilt, _) = run(on = false)
    val (onBare, onFilt, pushed) = run(on = true)
    println(f"""{"dir":"$src","pushed_in_plan":"$pushed",""" +
      f""""bare_agg_s":{"off":$offBare%.2f,"on":$onBare%.2f},""" +
      f""""filtered_agg_s":{"off":$offFilt%.2f,"on":$onFilt%.2f}}""")
    spark.stop()
  }
}
