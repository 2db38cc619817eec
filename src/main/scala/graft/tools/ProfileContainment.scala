package graft.tools

import graft.core.GraftSession
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Times d12's complete-recall containment join in its documented
  * 100 TB operating mode: over a SUSPECT SLICE, not the raw corpus
  * (`Dedup.containmentJoin` scaladoc). The raw-corpus form is
  * deliberately not probed at large replica factors — complete recall
  * means its candidate set grows ~quadratically with the replica's
  * duplicate-cluster size (at factor 100 the exploded prefix join
  * exceeded the sandbox's disk; measured, documented in BASELINE.md),
  * which is exactly why the scaladoc scopes it to slices.
  *
  * Usage: runMain graft.tools.ProfileContainment <sfDir> [sliceMod] [reps]
  * sliceMod = keep doc_id % sliceMod == 0 (10 → a 10% slice).
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mod = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = Tables(spark, dir).documents
      .filter(col("doc_id") % mod === 0)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      Dedup.containmentJoin(Dedup.shingleFrame(docs), 9, 10)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
      println(f"[profile] containment slice 1/$mod of $dir rep $r: $elapsed%.2f s")
    }
    spark.stop()
  }
}
