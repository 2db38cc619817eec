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
    // same loud rejection as Bench: a typo'd name must not die with a
    // bare key-not-found; the xxh64 twins are countable too
    val countable = graft.SparkEntry.queries ++ graft.SparkEntry.prodVariants
    val unknown = args.tail.filterNot(countable.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    args.tail.foreach { name =>
      val n = countable(name)(spark, dir).count()
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
      println(s"""{"query":"$name","sf":"$dir","rows":$n}""")
    }
    spark.stop()
  }
}
