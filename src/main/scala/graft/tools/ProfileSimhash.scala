package graft.tools

import graft.core.GraftSession
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stage-level timing for the simhash hash modes (dev tool):
  * `runMain graft.tools.ProfileSimhash <sfDir> <md5|xxh64> [reps]`.
  * Times the d4 shape (tokenize -> per-token hash -> 48 bit sums ->
  * simhash) through a noop write, reporting each rep. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("md5")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val docs = Tables(spark, dir).documents
    for (r <- 1 to reps) {
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
      val t0 = System.nanoTime()
      Dedup.simhash(toks, hashMode = mode)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] simhash[$mode] rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
