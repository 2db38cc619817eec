package graft.tools

import graft.core.GraftSession

/** Stage-level timing for the Bloom-screen hash modes (dev tool):
  * `runMain graft.tools.ProfileBloom <sfDir> <md5|xxh64> [reps]`.
  * Times the full x_bloom_decontaminate pipeline (build + screen)
  * through a noop write, reporting each rep. */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("md5")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.queries.AnalysisQueries.bloomDecontaminate(spark, dir, mode)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] bloom[$mode] rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
