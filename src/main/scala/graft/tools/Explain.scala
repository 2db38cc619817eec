package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Print the formatted physical plan of one or all registered queries —
  * the plan-review loop: check broadcasts, pushed filters, codegen spans.
  * Usage: runMain graft.tools.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val names = args.headOption.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
