package graft.tools

import graft.core.GraftSession
import graft.ext.AnnIndex
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sizes the ANN maintenance cadence (dev tool): how does the IVF
  * index actually degrade as append-only batches accumulate against a
  * stale quantizer, and what does the cadence compaction buy back?
  *
  * Contrast with the upsert table's delta tax (ProbeMor): there every
  * pending delta adds a flat ~0.03 s to every read, so the cadence is
  * a latency budget. An appended ANN batch costs query latency almost
  * nothing (same cell-equi-join, a few more files) — what it spends is
  * RECALL (true neighbors straddle boundaries the original quantizer
  * drew) and cell balance (scan cost concentrates in the cells the
  * appended mass piles into). So compactEvery is sized from this
  * probe's recall ladder, not from seconds.
  *
  * For each pending-append count on the ladder the probe reports:
  *   recall@3  — nprobe=1 index top-3 vs brute-force top-3 over the
  *               same stored rows (exact int64 cosines both sides)
  *   cand/probe — scanned candidate rows per probe (the cost shape)
  *   maxcell   — largest cell's share of stored vectors (imbalance)
  *   query_s   — wall seconds for the nprobe=1 top-3 query
  * then compacts and reports the same row (the buy-back).
  *
  * Two ingest regimes, because the cadence only matters under one:
  *   stationary — appended batches are drawn from the SAME distribution
  *     as the built corpus (odd-id slices). Expected: recall flat,
  *     compaction buys only cell balance.
  *   drifted — appended vectors are the corpus SHIFTED by a constant
  *     (+0.5 per dim, ids negated): new mass piles into the cells
  *     nearest the shift, the stale quantizer's boundaries stop
  *     describing the data, and the compaction visibly rebalances.
  *
  * Usage: runMain graft.tools.ProbeAnnCadence [sfDir] [nBatches] [regime]
  */
object ProbeAnnCadence {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val regime = args.lift(2).getOrElse("stationary")
    val emb = Tables(spark, dir).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-cadence").toString + "/ivf"

    // append mass: odd ids in nBatches round-robin slices (div 2 so
    // every slice is non-empty regardless of nBatches' parity), shifted
    // out of distribution in the drifted regime
    val appendMass = regime match {
      case "stationary" => emb.filter(col("vec_id") % 2 === 1)
      case "drifted" => emb.filter(col("vec_id") % 2 === 1)
        .select((-col("vec_id") - 1).as("vec_id"),
          expr("transform(embedding, x -> x + 0.5F)").as("embedding"))
      case other => sys.error(s"unknown regime $other")
    }
    // initial corpus: even ids
    AnnIndex.write(emb.filter(col("vec_id") % 2 === 0), path)
    val probes = emb.filter(col("vec_id") % 25 === 0).persist()
    val nProbes = probes.count()

    def measure(tag: String, pending: Int): Unit = {
      val t0 = System.nanoTime()
      val top = AnnIndex.query(probes, path, 3, 1)
        .select(col("probe_id"), col("neighbor_id")).collect().toSet
      val qSec = (System.nanoTime() - t0) / 1e9
      // brute force over the SAME stored rows: nprobe = k is exhaustive
      val k = AnnIndex.centroids(AnnIndex.read(spark, path))
        .agg(max(col("c_id"))).head().getLong(0).toInt + 1
      val truth = AnnIndex.query(probes, path, 3, k)
        .select(col("probe_id"), col("neighbor_id")).collect().toSet
      val recall =
        if (truth.isEmpty) 1.0
        else top.intersect(truth).size.toDouble / truth.size
      val cand = AnnIndex.vectors(AnnIndex.read(spark, path))
        .groupBy(col("cell")).count().persist()
      val nStored = cand.agg(sum(col("count"))).head().getLong(0)
      val maxCell = cand.agg(max(col("count"))).head().getLong(0)
      // nprobe=1: each probe scans exactly its argmin cell — expected
      // candidates per probe = stored/k weighted by the probe's cell;
      // report the stored-rows-per-cell distribution's implied scan
      val perProbe = AnnIndex.probeCells(probes, path, 1)
        .join(cand, "cell").agg(sum(col("count"))).head().getLong(0) /
        math.max(nProbes, 1L)
      cand.unpersist()
      println(f"[anncadence] $tag%-10s pending=$pending%2d stored=$nStored%6d " +
        f"recall@3=$recall%.3f cand/probe=$perProbe%5d " +
        f"maxcell=${maxCell.toDouble / nStored}%.3f query_s=$qSec%.2f")
      graft.core.CacheScope.releaseAll()
    }

    measure("built", 0)
    (0 until nBatches).foreach { i =>
      // div, not `/`: the Column `/` is FLOAT division, and a fractional
      // residue never equals the integer batch index — every slice
      // silently empty (the first cut of this probe did exactly that)
      AnnIndex.append(
        appendMass.filter(expr(s"(abs(vec_id) div 2) % $nBatches") === i),
        path)
      measure("appended", i + 1)
    }
    AnnIndex.compact(spark, path)
    measure("compacted", 0)
    probes.unpersist()
    spark.stop()
  }
}
