package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot probe: does Spark 4's runtime bloom-filter join filter
  * (spark.sql.optimizer.runtime.bloomFilter.*) fire on this repo's
  * fact-join shapes, and does it pay at replica scale? Prints the
  * session default, whether a BloomFilterMightContain shows up in the
  * final adaptive plan of the named query, and timed medians with the
  * flag forced on vs off. Findings go to BASELINE.md; this main takes
  * no position. Usage: ProbeBloom <sfDir> <query> [query...] */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    println(s"""{"default_$key":"${spark.conf.get(key)}"""")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.prodVariants
    val appThresh =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    for (name <- names; mode <- Seq("off", "default", "forced")) {
      spark.conf.set(key, (mode != "off").toString)
      // "forced": drop the 10GB application-side gate to what a replica
      // scan actually is, so the rewrite fires here at all — the
      // cluster-scale behavior, priced on the local box
      if (mode == "forced") spark.conf.set(appThresh, "64MB")
      else spark.conf.unset(appThresh)
      val times = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val qe = all(name)(spark, sfDir).queryExecution
        qe.toRdd.foreach(_ => ())
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, qe.executedPlan.toString)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      val fired = times.head._2.contains("might_contain")
      println(f""","$name-$mode":{"sec":$med%.3f,"bloom_in_plan":$fired}""")
    }
    println("}")
    spark.stop()
  }
}
