package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-vs-raw join probe: times the identical lineitem⋈orders
  * join+agg (q_bucketed_revenue's shape) over (a) the raw parquet —
  * both sides shuffled on orderkey every run — and (b) the committed
  * BucketedWarehouse pair — zero-exchange bucket zip — plus the
  * one-time bucketed-write cost that buys (b). The broadcast threshold
  * is disabled for BOTH variants: at real scale neither fact side
  * broadcasts, and AQE converting the small probe join to broadcast
  * would measure the wrong plan. Prints one JSON line.
  *
  * Usage: runMain graft.tools.ProbeBucketed <sfDir> [buckets]
  */
object ProbeBucketed {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeBucketed <sfDir> [buckets]")
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    def joinAgg(li: DataFrame, ord: DataFrame): DataFrame =
      li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.select(col("o_orderkey"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_items"))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

    // one-time write (or re-register): measured separately — this is
    // the cost the zero-shuffle join amortizes
    val t = graft.sources.Tables(spark, sfDir)
    val buildS = timed {
      graft.core.BucketedWarehouse.factPair(spark, sfDir, buckets)
    }
    val (liT, ordT) = graft.core.BucketedWarehouse.factPair(spark, sfDir, buckets)

    val rawS = median((1 to reps).map { _ =>
      timed(joinAgg(t.lineitem, t.orders)
        .write.format("noop").mode("overwrite").save())
    })
    val bktS = median((1 to reps).map { _ =>
      timed(joinAgg(spark.table(liT), spark.table(ordT))
        .write.format("noop").mode("overwrite").save())
    })
    val nb = spark.table(liT).inputFiles.length
    println(s"""{"probe":"bucketed","dir":"$sfDir","buckets":$nb,""" +
      s""""build_s":${graft.Bench.fmt3(buildS)},""" +
      s""""raw_join_s":${graft.Bench.fmt3(rawS)},""" +
      s""""bucketed_join_s":${graft.Bench.fmt3(bktS)}}""")
    spark.stop()
  }
}
