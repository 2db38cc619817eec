package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints one JSON line.
  *
  * Each query is materialized through a `noop` datasource write — unlike
  * `count()`, which lets Catalyst prune the expensive projections out of
  * the plan, noop executes the full physical plan including every
  * computed column. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one tiny warmup action so JVM/codegen startup isn't billed to the
    // first query
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      spark.catalog.clearCache() // drop query-local persists between runs
      // failed queries report -1 so they're distinguishable in the JSON
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // headline throughput: lineitem rows scanned per second on the
    // pricing-summary scan (pure scan+agg, the IO-bound shape)
    val liRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val q1Sec = results.toMap.getOrElse("q1_pricing_summary", -1.0)
    val rps = if (q1Sec > 0) liRows / q1Sec else 0.0
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","lineitem_rows":$liRows,"q1_rows_per_sec":$rps%.0f}""")
    spark.stop()
  }
}
