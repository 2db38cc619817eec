package graft.tools

import graft.core.GraftSession
import graft.ext.{Dedup, SkewGuard}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Natural-skew realism probe for the LSH skew treatments (dev tool;
  * results recorded in BASELINE.md round-7 notes).
  *
  * The synthetic corpus is CLEAN: duplicate clusters are small, so band
  * buckets stay near the expected cluster size and the r6 SkewGuard
  * demos had to force the drop path with a cap of 2. A NATURAL corpus
  * is not clean — template pages, license headers, and navigation
  * boilerplate put the same long token run into a large fraction of
  * documents, and for short documents that wrapper DOMINATES the
  * MinHash signature: with b boilerplate shingles vs n own shingles,
  * each sig chunk comes from the wrapper with probability b/(b+n), so a
  * whole band collides with probability ~(b/(b+n))^2 — piling
  * boilerplate-dominated docs into one corpus-scale band bucket whose
  * O(bucket^2) candidates are almost all FALSE pairs (bodies differ).
  *
  * This probe manufactures exactly that shape: a 120-token prefix and a
  * 120-token suffix wrapper on 30% of docs (distinct token vocabularies
  * so prefix and suffix shingle sets don't collapse), then measures at
  * realistic occupancy — the band-bucket tail, and candidate counts +
  * wall time for the three treatments (unguarded, df-cap drop, salt
  * split). Pass/fail expectations: the salted candidate count equals
  * the unguarded count exactly (recall preservation), the capped count
  * collapses toward the clean corpus's, and the capped time beats
  * unguarded by roughly the hot bucket's share of Σ bucket².
  *
  * Measured (BASELINE.md round-7 table): at sf1/cap=200 the wrapper
  * builds 9.9k/8.4k-doc hot buckets; unguarded candidates are 66.2M in
  * 59.3 s (single-straggler-bound — one bucket is 49M pairs on one
  * reducer), the df-cap keeps 317k in 2.9 s, and the salt split emits
  * the identical 66.2M in 51.7 s with every task bounded at ~2·cap
  * rows. Unguarded count grew 100× for 10× docs (quadratic in the hot
  * bucket); capped grew 2× (tracks cool buckets only).
  *
  * Usage: runMain graft.tools.SkewRealism [sfDir] [cap]
  */
object SkewRealism {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.lift(1).map(_.toInt).getOrElse(200)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val prefix = (1 to 120).map(i => s"bphdr$i").mkString(" ")
    val suffix = (1 to 120).map(i => s"bpftr$i").mkString(" ")
    val docs = Tables(spark, dir).documents
    val skewed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(10L)) < 3,
        concat_ws(" ", lit(prefix), col("text"), lit(suffix)))
        .otherwise(col("text")))

    val sh = Dedup.shingleFrame(skewed).persist()
    val sigs = Dedup.signaturesFromShingles(sh).persist()
    println(s"[skew] corpus: ${sigs.count()} docs (30% boilerplate-wrapped)")

    val bands = sigs.select(col("doc_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx", "band_hash")))
    val occ = SkewGuard.hotBuckets(bands, Seq("band_idx", "band_hash"), 0)
      .orderBy(desc("bucket_n")).limit(10).collect()
    println("[skew] top-10 band-bucket occupancy: " +
      occ.map(_.getAs[Long]("bucket_n")).mkString(", "))
    val sumSq = SkewGuard.hotBuckets(bands, Seq("band_idx", "band_hash"), 0)
      .agg(sum(col("bucket_n") * col("bucket_n"))).head.getLong(0)
    println(s"[skew] sum of bucket^2 (join work proxy): $sumSq")

    val nUnguarded = time("candidates unguarded")(
      Dedup.candidatePairs(sigs).count())
    val nCapped = time(s"candidates df-cap drop (cap=$cap)")(
      Dedup.candidatePairs(sigs, maxBucket = cap).count())
    val nSalted = time(s"candidates salt-split (cap=$cap)")(
      Dedup.candidatePairsSalted(sigs, maxBucket = cap).count())
    println(s"[skew] candidates: unguarded=$nUnguarded capped=$nCapped " +
      s"salted=$nSalted (salted must equal unguarded: " +
      s"${if (nSalted == nUnguarded) "OK" else "MISMATCH"})")

    // verify stage over the CAPPED candidates (the operating mode a
    // corpus team ships: drop degenerate buckets, then exact-verify)
    val nVerified = time("verify capped candidates @0.8")(
      Dedup.verifyJaccardOnShingles(sh,
        Dedup.candidatePairs(sigs, maxBucket = cap), 0.8).count())
    println(s"[skew] verified pairs (capped): $nVerified")
    spark.stop()
  }
}
