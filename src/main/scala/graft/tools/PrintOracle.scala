package graft.tools

/** Dev utility: print the registered DuckDB oracle SQL for the named
  * queries (no Spark session) — lets a generated oracle be validated
  * against DuckDB directly while iterating, without a full Verify run. */
object PrintOracle {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PrintOracle <query-name>...")
    args.foreach { n =>
      println(s"-- ORACLE $n")
      println(graft.SparkEntry.oracleSql.getOrElse(n,
        sys.error(s"no oracle registered for '$n'")))
    }
  }
}
