package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-probe timer: times the NAMED registry queries against a given
  * data directory and prints one JSON line — nothing else. Unlike
  * [[graft.Bench]] it never writes `BENCH_FULL.json`, so decade probes
  * against ScaleUp-synthesized directories can't clobber the official
  * per-round gate artifact, and it takes the data dir as an argument so
  * a multi-scale sweep is one loop in the shell.
  *
  * Usage: runMain graft.tools.ProbeQueries <sfDir> <query> [query...]
  * Same measurement discipline as Bench: per-query median of
  * SPARK_GRAFT_BENCH_REPS (default 3) noop-materialized runs, cache
  * teardown between reps outside the timed window, local[cpus] with
  * shuffle partitions = cpus.
  */
object ProbeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeQueries <sfDir> <query> [query...]")
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
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    val timeable = graft.SparkEntry.queries ++ graft.SparkEntry.prodVariants
    val unknown = names.filterNot(timeable.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // per-rep ladder on stderr: the median alone hides WHERE a slow
    // number comes from (JIT ramp: monotone decrease; fixture/persist
    // cold start: one slow first rep; host contention: reps scattered)
    // — the diagnosis this session needed three ProfileBloom detours
    // for. stderr so the stdout JSON line stays the whole contract.
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_REPS_VERBOSE").contains("1")
    val results = names.map { name =>
      val times = (1 to reps).flatMap { r =>
        val t0 = System.nanoTime()
        val ok =
          try { timeable(name)(spark, sfDir).write.format("noop")
                  .mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.releaseAll()
        spark.catalog.clearCache()
        if (ok && verbose)
          System.err.println(f"[probe] $name rep $r: $elapsed%.3f s")
        if (ok) Some(elapsed) else None
      }
      name -> (if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2))
    }
    // locale-pinned like Bench: a comma-decimal default locale would
    // make the probe line invalid JSON
    val qs = results.map { case (k, v) => "\"" + k + "\":" + graft.Bench.fmt3(v) }
      .mkString("{", ",", "}")
    println(s"""{"probe":"$sfDir","reps":$reps,"queries":$qs}""")
    spark.stop()
  }
}
