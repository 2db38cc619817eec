package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Price of the pre-flight occupancy refusal in the fixture-build path
  * (r15 verdict #8): the histogram pass runs once per unguarded fixture
  * build (clusters + idx-labels per sf dir — only when the fixture is
  * actually BUILT; standing fixtures never re-pay it). This measures
  * the pass standalone at a given dir, median of 3, against the
  * fixture build's own cost, so BASELINE can record the overhead
  * as a fraction rather than a guess.
  *
  * Usage: runMain graft.tools.ProbeRefusalCost [sfDir]
  */
object ProbeRefusalCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[refusalcost] corpus=${docs.count()} docs at $dir")
    def medianOf3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    // the corpus-side pass the two fixture builders run (same frame)
    val full = medianOf3 {
      Dedup.refuseHotBuckets(
        Dedup.signaturesFromShingles(Dedup.shingleFrame(docs)),
        1000, "probe")
    }
    println(f"[refusalcost] fixture-build refusal pass (full corpus): $full%.2f s")
    // the winnow surface's pass on the same corpus, for the d15 rows
    val winnow = medianOf3 {
      val raw = Dedup.winnowFingerprints(docs, 3, 4).persist()
      Dedup.refuseHotGroups(raw, Seq("h"), 1000, "probe")
      raw.unpersist()
    }
    println(f"[refusalcost] winnow-surface refusal pass: $winnow%.2f s")
    spark.stop()
  }
}
