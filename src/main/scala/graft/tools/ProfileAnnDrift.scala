package graft.tools

import graft.core.GraftSession
import graft.ext.{AnnIndex, Similarity}
import graft.queries.SimilarityQueries.snapped
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the centroid-drift story behind [[AnnIndex.compact]]
  * (dev tool): build the IVF index on an initial corpus, append a
  * DOMAIN-SHIFTED batch (every component offset by a constant — a new
  * data source the standing quantizer never saw; the driver corpus is
  * uniform, so drift must be manufactured to be measurable), and
  * compare the index BEFORE vs AFTER compaction on the three costs
  * drift actually incurs:
  *
  *  - recall@3 of [[AnnIndex.query]] for probes from the shifted batch,
  *    against exact brute-force cosine top-3 over the combined corpus;
  *  - candidates scanned per probe (the probe's cell occupancy) and the
  *    Σ cell² join-work proxy — a drifted quantizer funnels the shifted
  *    mass into few cells, so scan cost concentrates even when recall
  *    holds (neighbors of shifted vectors are mostly shifted vectors,
  *    which land in the same overgrown cell);
  *  - wall seconds for query, append, and the compaction itself.
  *
  * Usage: runMain graft.tools.ProfileAnnDrift [sfDir] [shift]
  */
object ProfileAnnDrift {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val shift = args.lift(1).map(_.toDouble).getOrElse(0.5)
    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[drift] $label: $s%.2f s"); (r, s)
    }
    val emb = Tables(spark, dir).embeddings
    val initial = emb.filter(col("vec_id") % 5 =!= 0).persist()
    val batch = emb.filter(col("vec_id") % 5 === 0)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(shift).cast("float")))
      .persist()
    val nInitial = initial.count(); val nBatch = batch.count()
    val combined = initial.unionByName(batch).persist()
    combined.count()
    val probes = batch.filter(col("vec_id") % 10 === 0).persist()
    val nProbes = probes.count()
    println(s"[drift] initial=$nInitial batch=$nBatch probes=$nProbes shift=$shift")

    // exact ground truth: brute-force cosine top-3 over the combined
    // corpus (broadcast probes, bounded-heap top-k — the y1 shape)
    val pSnap = snapped(probes, "probe_id", "pv", "pn")
    val exact = {
      val scored = snapped(combined, "neighbor_id", "nv", "nn")
        .join(broadcast(pSnap), col("probe_id") =!= col("neighbor_id"))
        .withColumn("cos", Similarity.cosineFromSnapped(
          col("pv"), col("nv"), col("pn"), col("nn")))
        .select(col("probe_id"), col("neighbor_id"), col("cos"))
      graft.ops.TopK.perKey(scored, Seq("probe_id"),
          Seq("cos" -> true, "neighbor_id" -> false), 3)
        .select(col("probe_id"), col("neighbor_id")).persist()
    }
    exact.count()

    val idxRoot = java.nio.file.Files.createTempDirectory("profdrift")
    val idx = idxRoot.toString + "/ivf"
    val (_, tBuild) = time("initial build")(AnnIndex.write(initial, idx))
    val (_, tAppend) = time("append shifted batch")(AnnIndex.append(batch, idx))

    def measure(tag: String, nprobe: Int): (Double, Double, Long, Double) = {
      val index = AnnIndex.read(spark, idx)
      val (ann, tQuery) = time(s"query [$tag, nprobe=$nprobe]") {
        val a = AnnIndex.query(probes, idx, 3, nprobe)
          .select(col("probe_id"), col("neighbor_id")).persist()
        a.count(); a
      }
      val hits = ann.join(exact, Seq("probe_id", "neighbor_id")).count()
      val recall = hits.toDouble / (nProbes * 3.0)
      // scan-cost shape: each probe reads its nprobe nearest cells —
      // measured through the query's OWN cell selection (probeCells),
      // as candidate rows per probe before the top-k heap
      val cells = AnnIndex.vectors(index).groupBy(col("cell"))
        .agg(count(lit(1)).as("n")).persist()
      val maxCell = cells.agg(max(col("n"))).head().getLong(0)
      // LEFT join + coalesce: a probe whose probed cells hold no
      // vectors must count as scan 0, not silently drop from the mean
      val cands = AnnIndex.probeCells(probes, idx, nprobe)
        .select(col("probe_id"), col("cell"))
        .join(cells, Seq("cell"), "left")
        .groupBy(col("probe_id"))
        .agg(sum(coalesce(col("n"), lit(0L))).as("scan"))
        .agg(avg(col("scan"))).head().getDouble(0)
      ann.unpersist(); cells.unpersist()
      graft.core.CacheScope.releaseAll()
      (recall, cands, maxCell, tQuery)
    }

    val (rStale, cStale, mStale, qStale) = measure("stale", 1)
    val (_, tCompact) = time("compact")(AnnIndex.compact(spark, idx))
    // the compacted index at increasing nprobe: the operating points a
    // maintenance cadence actually chooses between (stale monocell vs
    // rebalanced cells × multi-probe)
    val (rComp, cComp, mComp, qComp) = measure("compacted", 1)
    val (rComp2, cComp2, _, qComp2) = measure("compacted", 2)
    val (rComp4, cComp4, _, qComp4) = measure("compacted", 4)

    def f3(v: Double) = graft.Bench.fmt3(v)
    println(s"""{"metric":"ann_drift","sf":"$dir","shift":${f3(shift)},""" +
      s""""n_initial":$nInitial,"n_batch":$nBatch,"n_probes":$nProbes,""" +
      s""""recall_stale":${f3(rStale)},"recall_compacted":${f3(rComp)},""" +
      s""""recall_compacted_np2":${f3(rComp2)},"recall_compacted_np4":${f3(rComp4)},""" +
      s""""cand_per_probe_stale":${f3(cStale)},"cand_per_probe_compacted":${f3(cComp)},""" +
      s""""cand_per_probe_np2":${f3(cComp2)},"cand_per_probe_np4":${f3(cComp4)},""" +
      s""""max_cell_stale":$mStale,"max_cell_compacted":$mComp,""" +
      s""""t_build":${f3(tBuild)},"t_append":${f3(tAppend)},"t_compact":${f3(tCompact)},""" +
      s""""t_query_stale":${f3(qStale)},"t_query_compacted":${f3(qComp)},""" +
      s""""t_query_np2":${f3(qComp2)},"t_query_np4":${f3(qComp4)}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(idxRoot.toFile)
    spark.stop()
  }
}
