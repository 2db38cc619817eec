package graft.tools

import graft.core.GraftSession
import graft.ext.{Curation, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Measures the incremental-ingest claim (dev tool): maintaining
  * standing cluster labels via `Curation.incrementalLabels` (screen one
  * new batch against the committed index, fold pairs into yesterday's
  * labels) must cost batch-tracking work, while the from-scratch
  * alternative (`Curation.clusters` over the combined corpus) re-pays
  * shingling + candidates + verify + CC for every doc ever ingested.
  *
  * Fixture: corpus = (frac-1)/frac of documents (indexed + labeled
  * up front, NOT billed — that is yesterday's amortized state), batch =
  * the remaining 1/frac. Reported: from-scratch label seconds,
  * incremental label seconds, the ratio, and an exact label-equality
  * check (both paths label by component-min doc_id, so the frames must
  * match row for row).
  *
  * Usage: runMain graft.tools.ProfileIncremental [sfDir] [frac]
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val frac = args.lift(1).map(_.toInt).getOrElse(50)
    require(frac >= 2, s"frac must be >= 2, got $frac")
    val docs = Tables(spark, dir).documents
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label: $s%.2f s"); (r, s)
    }
    val corpus = docs.filter(col("doc_id") % frac =!= 0).persist()
    val batch = docs.filter(col("doc_id") % frac === 0).persist()
    println(s"[profile] corpus=${corpus.count()} batch=${batch.count()} docs")
    // yesterday's amortized state: the committed index and the standing
    // labels — built outside the measured windows
    val tmpRoot = java.nio.file.Files.createTempDirectory("profinc")
    val idx = tmpRoot.toString + "/idx"
    Dedup.writeNeardupIndex(corpus, idx)
    val standing = Curation.clusters(corpus).persist()
    standing.count()
    graft.core.CacheScope.releaseAll()

    val (incLabels, incSec) = time("incremental labels (screen + merge)") {
      val l = Curation.incrementalLabels(standing, batch, idx).persist()
      l.count(); l
    }
    graft.core.CacheScope.releaseAll()
    val (fullLabels, fullSec) = time("from-scratch labels (combined corpus)") {
      val l = Curation.clusters(docs).persist()
      l.count(); l
    }
    graft.core.CacheScope.releaseAll()

    // both CC variants label every pair-graph vertex by component-min
    // doc_id, so the frames are directly comparable after projecting to
    // a fixed column order/type
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").cast("long"), col("cluster_id").cast("long"))
    val same = canon(incLabels).exceptAll(canon(fullLabels)).isEmpty &&
      canon(fullLabels).exceptAll(canon(incLabels)).isEmpty
    println(f"[profile] labels equal (canonicalized): $same")
    println(f"[profile] speedup: ${fullSec / incSec}%.1fx " +
      f"(incremental $incSec%.2f s vs from-scratch $fullSec%.2f s)")
    incLabels.unpersist(); fullLabels.unpersist()
    corpus.unpersist(); batch.unpersist()
    // repeated sweeps must not litter the temp filesystem with indexes
    org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
    spark.stop()
  }
}
