package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Cost of doubling a bucketed table's bucket count, both ways:
  * [[graft.core.BucketedWarehouse.split]] (bucketed scan → one task
  * per old bucket → two child files each, ZERO exchange) versus the
  * naive full rewrite (plain file scan → repartition(2n, key) — a
  * full shuffle of every row — → bucketed write). Same input, same
  * output layout; the only difference is the exchange, which is
  * exactly what split exists to avoid and what a 100 TB table cannot
  * afford to repeat. Prints one JSON line.
  *
  * Usage: runMain graft.tools.ProbeSplit <sfDir> [buckets] */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeSplit <sfDir> [buckets]")
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val base = java.nio.file.Files.createTempDirectory("graft-split-probe")
      .toString
    val li = graft.sources.Tables(spark, sfDir).lineitem
    val rows = li.count()

    // the split path: ensure(n) once, then split → 2n
    graft.core.BucketedWarehouse.ensure(spark, "graft_split_probe_a",
      s"$base/a", n, "l_orderkey")(li)
    val tSplit = timed {
      graft.core.BucketedWarehouse.split(spark, "graft_split_probe_a")
    }

    // the naive path over an identical copy: full shuffle to 2n
    graft.core.BucketedWarehouse.ensure(spark, "graft_split_probe_b",
      s"$base/b", n, "l_orderkey")(li)
    val tShuffle = timed {
      spark.read.parquet(s"$base/b")
        .repartition(2 * n, col("l_orderkey"))
        .write.format("parquet")
        .bucketBy(2 * n, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/b2")
        .saveAsTable("graft_split_probe_b2")
    }

    spark.sql("DROP TABLE IF EXISTS graft_split_probe_a")
    spark.sql("DROP TABLE IF EXISTS graft_split_probe_b")
    spark.sql("DROP TABLE IF EXISTS graft_split_probe_b2")
    println(f"""{"probe_split":"$sfDir","rows":$rows,"buckets":$n,""" +
      f""""split_sec":$tSplit%.3f,"shuffle_rewrite_sec":$tShuffle%.3f}""")
    spark.stop()
  }
}
