package graft.tools

import graft.core.GraftSession
import graft.ext.Dedup
import graft.sources.Tables

/** Winnowing shared-span probe (dev tool): times the unguarded d15
  * join against the df-capped production mode on the same directory,
  * printing pair counts so the recall cost of the cap is visible next
  * to its speedup. The ScaleUp replica fixture is adversarial for the
  * UNGUARDED mode by construction — every original doc becomes a
  * factor-sized near-identical cluster, so fingerprint posting lists
  * grow with the factor and the join pays sum(df^2); the cap bounds
  * each posting list exactly like the MinHash band guard.
  *
  * Usage: runMain graft.tools.ProfileWinnow <dir> [maxBucket] [minShared]
  */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(200)
    val minShared = args.lift(2).map(_.toLong).getOrElse(2L)
    val docs = Tables(spark, dir).documents
    def run(label: String, maxBucket: Int): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.winnowSharedSpans(docs, k = 4, w = 4, minShared,
        maxBucket).count()
      graft.core.CacheScope.releaseAll()
      println(f"[winnow] $label: pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // first run absorbs JIT/codegen warmup — discard its timing
    run("warmup (unguarded)", 0)
    run("unguarded", 0)
    run(s"df-cap $cap", cap)
    spark.stop()
  }
}
