package graft.tools

import graft.core.GraftSession

/** Output-cardinality probe for the scale notes: row counts of named
  * registered queries at a given sf dir — the denominator for the
  * "factor ≤ ~linear-in-output" argument in BASELINE.md.
  *
  * Usage: runMain graft.tools.CountRows <sfDir> <query...>
  */
object CountRows {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    args.tail.foreach { name =>
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
      println(s"""{"query":"$name","sf":"$dir","rows":$n}""")
    }
    spark.stop()
  }
}
