package graft.tools

import graft.core.GraftSession
import graft.ext.{Dedup, Similarity}
import graft.queries.SimilarityQueries.snapped
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The corpus-independence probe for the index-shaped operators (dev
  * tool): screen a FIXED-size batch against indexes built over corpora
  * that grow by decades, and record how the per-ingest cost actually
  * moves. The registered d9/d14/y7 queries derive their batch from the
  * probed dir, so their cost scales with the batch too — this tool pins
  * the batch (documents/embeddings from a fixed source dir, ids negated
  * to dodge collisions with replica ids) and varies ONLY the index
  * corpus, which is the claim as stated: "ingest cost tracks the batch,
  * not the corpus".
  *
  * What honest growth remains: on the ScaleUp replica corpus every
  * batch doc's duplicate cluster grows with the factor (its perturbed
  * replicas are all near-dups), so CANDIDATES grow linearly with factor
  * even at fixed batch — the probe prints candidate/pair counts next to
  * seconds so the cost can be attributed (screen time should track
  * candidates + one column-pruned index scan, never corpus shingling).
  *
  * Measures per probed dir: (a) near-dup index build seconds (the
  * amortized cost, reported for context), (b) fixed-batch d9 screen
  * seconds + candidate + verified-pair counts, (c) fixed-probe ANN
  * bucket query seconds + candidate count against the y7-shape LSH
  * index.
  *
  * Usage: runMain graft.tools.ProbeIndexScale <indexCorpusDir> [batchDir]
  */
object ProbeIndexScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val batchDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[idxscale] $label: $s%.2f s"); (r, s)
    }
    def f3(v: Double) = graft.Bench.fmt3(v)

    // fixed batch: the source dir's doc_id % 5 == 0 slice, ids negated
    // so they can never collide with replica ids in the probed corpus
    val batch = Tables(spark, batchDir).documents
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", -col("doc_id") - 1)
      .persist()
    val probes = Tables(spark, batchDir).embeddings
      .filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", -col("vec_id") - 1)
      .persist()
    val corpusDocs = Tables(spark, dir).documents
    val corpusEmb = Tables(spark, dir).embeddings
    val nCorpus = corpusDocs.count(); val nBatch = batch.count()
    val nVecs = corpusEmb.count(); val nProbes = probes.count()
    println(s"[idxscale] corpus=$nCorpus docs/$nVecs vecs; " +
      s"fixed batch=$nBatch docs/$nProbes probes (from $batchDir)")

    val idxRoot = java.nio.file.Files.createTempDirectory("idxscale")
    val ndIdx = idxRoot.toString + "/neardup"
    val annIdx = idxRoot.toString + "/ann"
    val (_, tBuildNd) = time("near-dup index build")(
      Dedup.writeNeardupIndex(corpusDocs, ndIdx))
    val (_, tBuildAnn) = time("ANN (LSH bucket) index build")(
      graft.queries.SimilarityQueries.writeAnnIndex(corpusEmb, annIdx))

    // (b) the d9 screen at fixed batch: candidates for attribution,
    // then the full screen (candidates + sorted-merge Jaccard verify)
    val index = Dedup.readNeardupIndex(spark, ndIdx)
    val bBands = Dedup.signaturesFromShingles(Dedup.shingleFrame(batch))
      .select(col("doc_id").as("batch_id"),
        posexplode(array(col("band0"), col("band1")))
          .as(Seq("band_idx", "band_hash")))
    val iBands = index.select(col("doc_id").as("corpus_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx", "band_hash")))
    val (nCand, tCand) = time("d9 candidates (fixed batch)")(
      bBands.join(iBands, Seq("band_idx", "band_hash"))
        .select(col("batch_id"), col("corpus_id")).distinct().count())
    graft.core.CacheScope.releaseAll()
    val (nPairs, tScreen) = time("d9 screen end-to-end (fixed batch)")(
      Dedup.incrementalNeardup(spark, batch, ndIdx, 0.8).count())
    graft.core.CacheScope.releaseAll()

    // (c) the y7-shape bucket query at fixed probes
    val pSnap = snapped(probes, "probe_id", "pv", "pn")
      .withColumn("bucket", Similarity.lshBucket(col("pv"), 8, 64))
    val ann = graft.queries.SimilarityQueries.readAnnIndex(spark, annIdx)
    val (nAnnCand, tAnn) = time("ANN bucket query (fixed probes)") {
      ann.join(pSnap, col("bucket") === col("bucket_b"))
        .withColumn("cos", Similarity.cosineFromSnapped(
          col("pv"), col("nv"), col("pn"), col("nn")))
        .filter(col("cos") >= -2.0) // force the cosine column to execute
        .count()
    }
    println(s"""{"metric":"index_scale","corpus":"$dir","batch":"$batchDir",""" +
      s""""n_corpus":$nCorpus,"n_batch":$nBatch,"n_vecs":$nVecs,"n_probes":$nProbes,""" +
      s""""t_build_neardup":${f3(tBuildNd)},"t_build_ann":${f3(tBuildAnn)},""" +
      s""""d9_candidates":$nCand,"t_d9_candidates":${f3(tCand)},""" +
      s""""d9_pairs":$nPairs,"t_d9_screen":${f3(tScreen)},""" +
      s""""ann_candidates":$nAnnCand,"t_ann_query":${f3(tAnn)}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(idxRoot.toFile)
    spark.stop()
  }
}
