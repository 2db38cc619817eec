package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Print the formatted physical plan of one or all registered queries —
  * the plan-review loop: check broadcasts, pushed filters, codegen spans.
  * With `--run`, execute the query first and print the FINAL adaptive
  * plan instead — the only way to see AQE's runtime join conversions
  * (initial plans show SortMergeJoin wherever a side has no static
  * stats, e.g. behind an ExistingRDD).
  * Usage: runMain graft.tools.Explain [--run] [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val run = args.contains("--run")
    val rest = args.filterNot(_ == "--run")
    val spark = GraftSession.local(8)
    val dir = rest.lift(1).getOrElse("/root/testdata/sf0.01")
    val names = rest.headOption.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      if (run) {
        // execute THIS plan instance (a write/count spawns its own
        // QueryExecution and would leave this one un-adapted), then
        // print it — AQE mutates the AdaptiveSparkPlanExec in place
        val plan = df.queryExecution.executedPlan
        plan.execute().count()
        println(plan.toString)
      } else df.explain("formatted")
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
