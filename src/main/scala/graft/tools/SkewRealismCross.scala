package graft.tools

import graft.core.GraftSession
import graft.ext.{Dedup, SkewGuard}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Natural-skew realism probe for the batch×index CROSS screen (dev
  * tool; the [[SkewRealism]] sibling measures the self-join) — the
  * operational d9 shape under the same manufactured boilerplate skew:
  * 30% of docs wrapped in a 120-token template prefix/suffix, corpus
  * side (doc_id % 5 != 0) committed to a near-dup index, batch side
  * (the rest) screened against it. A hot INDEX posting list multiplies
  * against every colliding batch row, so the unguarded screen's
  * candidate term is O(|hot| · |batch∩hot|) on one reducer — the
  * straggler the round-8 salt mode exists to bound.
  *
  * Measures, per treatment (unguarded / df-cap drop / 2-D salt split):
  * candidate count, verified-pair count at 0.8, wall seconds. Pass
  * expectations: salted candidates and pairs EQUAL the unguarded
  * screen's exactly (recall preservation — hash-checked cross-engine by
  * d9_incremental_salted); capped counts collapse to the cool buckets.
  *
  * Usage: runMain graft.tools.SkewRealismCross [sfDir] [cap]
  */
object SkewRealismCross {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(200)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[xskew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val prefix = (1 to 120).map(i => s"bphdr$i").mkString(" ")
    val suffix = (1 to 120).map(i => s"bpftr$i").mkString(" ")
    val docs = Tables(spark, dir).documents
    val skewed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(10L)) < 3,
        concat_ws(" ", lit(prefix), col("text"), lit(suffix)))
        .otherwise(col("text")))
    val corpus = skewed.filter(col("doc_id") % 5 =!= 0)
    val batch = skewed.filter(col("doc_id") % 5 === 0).persist()
    println(s"[xskew] corpus=${corpus.count()} batch=${batch.count()} docs " +
      "(30% boilerplate-wrapped)")

    val idxRoot = java.nio.file.Files.createTempDirectory("xskew")
    val idx = idxRoot.toString + "/idx"
    time("index build (unguarded write)")(Dedup.writeNeardupIndex(corpus, idx))

    // candidate-stage counts, the term the guards bound
    val index = Dedup.readNeardupIndex(spark, idx)
    val bBands = Dedup.signaturesFromShingles(Dedup.shingleFrame(batch))
      .select(col("doc_id").as("batch_id"),
        posexplode(array(col("band0"), col("band1")))
          .as(Seq("band_idx", "band_hash"))).persist()
    bBands.count()
    def iBands = index.select(col("doc_id").as("corpus_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx", "band_hash")))
    val hotTop = iBands.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(5)
      .select(col("n")).collect().map(_.getLong(0))
    println(s"[xskew] top-5 index posting-list occupancy: ${hotTop.mkString(", ")}")
    val nUng = time("candidates unguarded")(
      bBands.join(iBands, Seq("band_idx", "band_hash"))
        .select(col("batch_id"), col("corpus_id")).distinct().count())
    val nCap = time(s"candidates df-cap drop (cap=$cap)") {
      val capped = SkewGuard.capBuckets(iBands, Seq("band_idx", "band_hash"), cap)
      bBands.join(capped, Seq("band_idx", "band_hash"))
        .select(col("batch_id"), col("corpus_id")).distinct().count()
    }
    val nSalt = time(s"candidates 2-D salt split (cap=$cap)")(
      SkewGuard.saltedCrossJoinPairs(bBands, iBands,
        Seq("band_idx", "band_hash"), "batch_id", "corpus_id", cap).count())
    println(s"[xskew] candidates: unguarded=$nUng capped=$nCap salted=$nSalt " +
      s"(salted must equal unguarded: ${if (nSalt == nUng) "OK" else "MISMATCH"})")

    // end-to-end screens (candidates + exact-Jaccard verify)
    def screen(label: String, mb: Int, mode: String): Long = {
      val n = time(label)(
        Dedup.incrementalNeardup(spark, batch, idx, 0.8,
          maxBucket = mb, skewMode = mode).count())
      graft.core.CacheScope.releaseAll()
      n
    }
    val pUng = screen("screen unguarded", 0, "drop")
    val pCap = screen(s"screen df-cap (cap=$cap)", cap, "drop")
    val pSalt = screen(s"screen salt (cap=$cap)", cap, "salt")
    println(s"[xskew] verified pairs: unguarded=$pUng capped=$pCap salted=$pSalt " +
      s"(salted must equal unguarded: ${if (pSalt == pUng) "OK" else "MISMATCH"})")
    org.apache.commons.io.FileUtils.deleteQuietly(idxRoot.toFile)
    spark.stop()
  }
}
