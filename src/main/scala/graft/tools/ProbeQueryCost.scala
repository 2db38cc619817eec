package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Structural cost probe for registered queries — the UI-less stand-in
  * for the Stage/SQL tabs the optimization guide (§1/§7) reads first:
  * per query, one warm noop-materialized run reported as
  *   jobs / stages / tasks — the dispatch shape (an iterative query's
  *     round count shows up here, not in any plan),
  *   task_ms — SUM of executor run time across tasks: the work metric
  *     that is nearly deterministic run-to-run where wall-clock on this
  *     box carries ±0.5 s of window noise (what before/after comparisons
  *     should be read from),
  *   shuffle_mb — bytes written to shuffle (exchange mass, the guide §2
  *     lever), and input_rows — records read from sources (re-scan
  *     detection: a doubled corpus read doubles this).
  * Usage: runMain graft.tools.ProbeQueryCost <sfDir> <query> [query...]
  * (SPARK_GRAFT_PROBE_REPS measured reps after 1 untimed warmup;
  * default 1 — the structural counters don't need medians.)
  */
object ProbeQueryCost {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeQueryCost <sfDir> <query> [query...]")
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
    val timeable = graft.SparkEntry.queries ++ graft.SparkEntry.prodVariants
    val unknown = names.filterNot(timeable.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    graft.SparkEntry.prepareFixturesFor(spark, sfDir,
      names.toSet.intersect(graft.SparkEntry.fixtureReaders))

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0)
    val inRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          runMs.addAndGet(t.taskMetrics.executorRunTime)
          shufW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          inRows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
      }
    })
    // the listener bus is async — settle before reading/resetting
    def drain(): Unit = Thread.sleep(800)
    def reset(): Unit = { drain(); Seq(jobs, stages, tasks, runMs, shufW,
      inRows).foreach(_.set(0)) }

    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    val rows = names.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        timeable(name)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.releaseAll()
        spark.catalog.clearCache()
        w
      }
      once() // warmup: JIT + any lazy first-touch artifact build
      reset()
      val walls = (1 to reps).map(_ => once())
      drain()
      val wall = walls.sorted.apply(walls.size / 2)
      f""""$name":{"wall_s":$wall%.2f,"jobs":${jobs.get / reps},"stages":${stages.get / reps},"tasks":${tasks.get / reps},"task_ms":${runMs.get / reps},"shuffle_mb":${shufW.get / reps / 1e6}%.1f,"input_rows":${inRows.get / reps}}"""
    }
    println(rows.mkString("{\"probe\":\"query_cost\",\"sf\":\"" + sfDir + "\",",
      ",", "}"))
    spark.stop()
  }
}
