package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Quantizer training at the second decade: full-corpus Lloyd fit vs
  * the production SAMPLE-fit (train the coarse quantizer on a hash
  * slice, assign the full corpus) — r12 ask #3's "record where
  * quantizer training needs sampling".
  *
  * What is and is not corpus-sized in this repo's quantizers:
  *  - IVF coarse model (y4/y11/y17): seed pick is first-K (cheap), but
  *    each Lloyd refinement round runs assignToCells over the WHOLE
  *    corpus — K·N dot products per round. This is the part production
  *    systems fit on a sample (FAISS trains IVF on ~30-256 vectors per
  *    centroid, then assigns the full corpus once).
  *  - PQ codebook (y9..y15): the first-k subvector rule — no training
  *    pass at all. A retrained codebook would be per-subspace Lloyd,
  *    sampled exactly like the coarse fit.
  *  - SQ8 stats: one min/max aggregation — a single cheap scan, and
  *    sampling would be WRONG (a sampled min/max clips the true range,
  *    saturating tail components from day one — the drift failure mode
  *    ProbeSq8Drift measures, built in at fit time).
  *
  * Measured quantities, full-fit vs sample-fit (vec_id % `stride` = 0):
  * wall time of (seed + refine) vs (seed + refine on slice), wall time
  * of the final full-corpus assignment (identical in both — the
  * unavoidable corpus pass), and quantization quality as the exact
  * int64 MEAN L2 distance to the assigned centroid (the k-means
  * objective, engine-deterministic).
  *
  * Usage: runMain graft.tools.ProbeSampleFit [sfDir] [stride]
  */
object ProbeSampleFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf100v")
    val stride = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"[samplefit] corpus=$n vectors, sample stride=$stride")

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[samplefit] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val vecs = SimilarityQueries.snapped(emb, "vec_id", "sv", "nrm")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    // mean exact-int64 L2 to the assigned centroid — the k-means
    // objective the two fits are compared on
    def meanQDist(assignedWithDist: DataFrame): Double =
      assignedWithDist.agg(avg(col("dist").cast("double"))).head().getDouble(0)
    // the assignToCells shape (explode + broadcast equi-join + min_by
    // partial agg), kept here only because the probe also needs the
    // argmin DISTANCE, which assignToCells deliberately drops
    def assignWithDist(cents: DataFrame): DataFrame =
      vecs.withColumn("c_id", explode(sequence(lit(0L), lit(15L))))
        .join(broadcast(cents.select(col("c_id"), col("cv"))), "c_id")
        .withColumn("dist", graft.functions.L2DistanceLong.l2_long(
          col("sv"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("c_id"))).as("m"))
        .select(col("vec_id"), col("m.c_id").as("cell"), col("m.dist").as("dist"))

    // ---- full fit: seed + one Lloyd round over the WHOLE corpus ------
    val fullCents = timed("full fit (seed + Lloyd over corpus)") {
      val c = SimilarityQueries.lloydRefine(
        SimilarityQueries.assignToCells(vecs,
          SimilarityQueries.seedCentroids(vecs, 16), 16))
      c.count(); c
    }
    val fullAssigned = timed("full-corpus assignment (full-fit centroids)") {
      val a = assignWithDist(fullCents).persist(); a.count(); a
    }
    val fullQ = meanQDist(fullAssigned)

    // ---- sample fit: seed + Lloyd over the hash slice ----------------
    val slice = vecs.filter(col("vec_id") % stride === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sliceN = slice.count()
    val sampleCents = timed(s"sample fit (seed + Lloyd over $sliceN vectors)") {
      val c = SimilarityQueries.lloydRefine(
        SimilarityQueries.assignToCells(slice,
          SimilarityQueries.seedCentroids(slice, 16), 16))
      c.count(); c
    }
    val sampleAssigned = timed("full-corpus assignment (sample-fit centroids)") {
      val a = assignWithDist(sampleCents).persist(); a.count(); a
    }
    val sampleQ = meanQDist(sampleAssigned)

    def cellSpread(a: DataFrame): (Long, Long) = {
      val s = a.groupBy(col("cell")).count()
        .agg(min(col("count")), max(col("count"))).head()
      (s.getLong(0), s.getLong(1))
    }
    val (fMin, fMax) = cellSpread(fullAssigned)
    val (sMin, sMax) = cellSpread(sampleAssigned)
    println(f"[samplefit] mean qdist: full-fit $fullQ%.0f vs sample-fit " +
      f"$sampleQ%.0f (ratio ${sampleQ / fullQ}%.4f)")
    println(s"[samplefit] cell occupancy full-fit [$fMin..$fMax] " +
      s"sample-fit [$sMin..$sMax]")

    // ---- the guarded production recipe (AnnIndex.writeSampleFit) -----
    // same sample fit, occupancy bounded at maxCellShare: the r13
    // occupancy caveat closed by a guard instead of a scaladoc warning
    graft.core.CacheScope.releaseAll()
    val maxShare = 2.0 / 16 // 2x the uniform share — the 2.4x-hot caveat's bound
    val guardPath = java.nio.file.Files
      .createTempDirectory("graft-samplefit-guard").toString + "/ivf"
    val share = timed(f"guarded writeSampleFit (maxCellShare=$maxShare%.3f)") {
      graft.ext.AnnIndex.writeSampleFit(emb, guardPath, k = 16,
        lloydIters = 1, sampleStride = stride, maxCellShare = maxShare)
    }
    val idx = graft.ext.AnnIndex.read(spark, guardPath)
    val gSpread = graft.ext.AnnIndex.vectors(idx).groupBy(col("cell")).count()
      .agg(min(col("count")), max(col("count")), count(lit(1))).head()
    println(f"[samplefit] guarded: final hottest share $share%.4f " +
      s"(bound ${maxShare}), occupancy [${gSpread.getLong(0)}..${gSpread.getLong(1)}] " +
      s"over ${gSpread.getLong(2)} cells")

    // ---- the cadence rebuild A/B: compact vs compactSampleFit --------
    // same append-grown index twice, one full-Lloyd rewrite vs the
    // guarded sample-fit rewrite — the maintenance job a 100 TB index
    // pays per cadence, which is where the training cut actually lands
    graft.core.CacheScope.releaseAll()
    def grown(): String = {
      val p = java.nio.file.Files
        .createTempDirectory("graft-samplefit-cad").toString + "/ivf"
      graft.ext.AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 0), p)
      graft.ext.AnnIndex.append(emb.filter(col("vec_id") % 5 === 0), p)
      p
    }
    // both at lloydIters = 1 (the demo dial) AND 3: at one round the
    // guard's corpus reassignments can eat the sample fit's saving;
    // the cut scales with the Lloyd budget (production quantizers run
    // many rounds, each a K·N corpus pass under full compact but a
    // K·N/stride sample pass here)
    for (iters <- Seq(1, 3)) {
      val (pFull, pSampled) = (grown(), grown())
      timed(s"cadence rebuild, full compact (lloydIters=$iters)") {
        graft.ext.AnnIndex.compact(spark, pFull, lloydIters = iters)
      }
      val cadShare = timed(
        s"cadence rebuild, compactSampleFit(stride=$stride, lloydIters=$iters)") {
        graft.ext.AnnIndex.compactSampleFit(spark, pSampled,
          lloydIters = iters, sampleStride = stride, maxCellShare = maxShare)
      }
      println(f"[samplefit] sampled rebuild hottest share $cadShare%.4f " +
        s"(bound $maxShare)")
    }

    // ---- split-round strategy A/B (r14 verdict #4 / DeltaSplitMinK) --
    // the delta reassignment's win case is quantizer WIDTH: at k=16 the
    // full K·N codegen argmin is cheaper than the delta's fixed costs
    // (slim-state shuffle + hot-member semi-join + landing); at
    // production widths the K·N arithmetic dominates and the delta
    // wins. Both strategies are bit-identical (AnnIndexSpec); this
    // measures the crossover on the same guarded rebuild at k = 16
    // and 64.
    graft.core.CacheScope.releaseAll()
    val snappedAll = SimilarityQueries.snapped(emb, "vec_id", "sv", "nrm")
    for (kk <- Seq(16, 64, 256); delta <- Seq(false, true)) {
      val p = java.nio.file.Files
        .createTempDirectory("graft-samplefit-ab").toString + "/ivf"
      val s = timed(s"guarded sampleFit k=$kk splitDelta=$delta") {
        graft.ext.AnnIndex.sampleFitFrom(snappedAll, p, k = kk,
          lloydIters = 1, sampleStride = stride,
          maxCellShare = 2.0 / kk, extraLloydRounds = 1, maxSplits = 4,
          splitDelta = Some(delta))
      }
      println(f"[samplefit]   k=$kk delta=$delta final share $s%.4f")
    }
    spark.stop()
  }
}
