package graft

import graft.ext.AnnIndex
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained IVF ANN index lifecycle (ext/AnnIndex): build / query
  * parity with the oracle-checked y4 quantizer, append against standing
  * centroids, and the centroid-drift compaction's determinism guarantee
  * (compacting an append-grown index == building from scratch over the
  * combined corpus — the ANN analog of d14's label equality). */
class AnnIndexSpec extends SparkTestBase {

  private def emb = Tables(spark, sf()).embeddings

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-annidx").toString + "/ivf"

  private def canon(index: DataFrame): DataFrame =
    index.select(col("kind"), col("id"), col("sv"), col("nrm"), col("cell"))

  private def assertSameIndex(a: DataFrame, b: DataFrame): Unit = {
    assert(canon(a).exceptAll(canon(b)).isEmpty &&
      canon(b).exceptAll(canon(a)).isEmpty,
      "index artifacts differ")
  }

  test("write + query over the full corpus reproduces the oracle-checked y4 IVF query") {
    val path = freshPath()
    AnnIndex.write(emb, path) // k=16, 1 Lloyd round — y4's dials
    val viaIndex = AnnIndex.query(emb.filter(col("vec_id") % 50 === 0), path)
      .collect().toSet
    graft.core.CacheScope.releaseAll()
    val y4 = graft.queries.SimilarityQueries.annIvf(spark, sf())
      .collect().toSet
    graft.core.CacheScope.releaseAll()
    // same quantizer (hash-ordered seed, one Lloyd round, exact int64),
    // same probe set, same top-3 — the committed artifact changes the
    // execution shape, never the answer
    assert(viaIndex === y4)
    assert(viaIndex.nonEmpty)
  }

  test("append assigns to the STANDING centroids and leaves the quantizer untouched") {
    val path = freshPath()
    val initial = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    AnnIndex.write(initial, path)
    val centsBefore = AnnIndex.centroids(AnnIndex.read(spark, path))
      .collect().toSet
    AnnIndex.append(batch, path)
    val after = AnnIndex.read(spark, path)
    // every vector of both generations is present exactly once
    assert(AnnIndex.vectors(after).count() === emb.count())
    assert(AnnIndex.vectors(after).select("vec_id").distinct().count() === emb.count())
    // the quantizer rows are byte-identical — append never touches them
    assert(AnnIndex.centroids(after).collect().toSet === centsBefore)
    graft.core.CacheScope.releaseAll()
  }

  test("compacting an append-grown index EQUALS a from-scratch build over the combined corpus") {
    val grown = freshPath()
    val fresh = freshPath()
    AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 0), grown)
    AnnIndex.append(emb.filter(col("vec_id") % 5 === 0), grown)
    AnnIndex.write(emb, fresh)
    // before compaction the grown index's quantizer is the stale one —
    // the artifacts genuinely differ (otherwise this test proves nothing)
    val grownBefore = AnnIndex.centroids(AnnIndex.read(spark, grown)).collect().toSet
    val freshCents = AnnIndex.centroids(AnnIndex.read(spark, fresh)).collect().toSet
    assert(grownBefore !== freshCents, "fixture must actually drift the centroids")
    AnnIndex.compact(spark, grown)
    // determinism: hash-ordered seeding + exact-int64 Lloyd over the
    // identical snapped vector set -> row-identical artifacts
    assertSameIndex(AnnIndex.read(spark, grown), AnnIndex.read(spark, fresh))
    // and the compacted index is committed + queryable
    assert(AnnIndex.query(emb.filter(col("vec_id") % 50 === 0), grown)
      .count() > 0)
    graft.core.CacheScope.releaseAll()
  }

  test("appendAndMaybeCompact fires the rebuild exactly at the cadence and resets the counter") {
    val path = freshPath()
    val slices = (0 to 3).map(i => emb.filter(col("vec_id") % 4 === i))
    AnnIndex.write(slices(0), path)
    val gen0 = AnnIndex.generation(spark, path)
    assert(AnnIndex.pendingAppends(spark, path) === 0,
      "a fresh build starts with no pending appends")
    // below the cadence: plain appends — counter advances, quantizer
    // generation untouched (consumers holding centroids stay valid)
    assert(!AnnIndex.appendAndMaybeCompact(slices(1), path, compactEvery = 3))
    assert(!AnnIndex.appendAndMaybeCompact(slices(2), path, compactEvery = 3))
    assert(AnnIndex.pendingAppends(spark, path) === 2)
    assert(AnnIndex.generation(spark, path) === gen0,
      "sub-cadence appends must not bump the generation")
    // at the cadence: the append lands AND the quantizer rebuilds —
    // fresh generation, counter reset (absent sidecar = 0)
    assert(AnnIndex.appendAndMaybeCompact(slices(3), path, compactEvery = 3))
    assert(AnnIndex.pendingAppends(spark, path) === 0,
      "compaction must reset the cadence counter")
    assert(AnnIndex.generation(spark, path) !== gen0,
      "the cadence compaction must commit a new quantizer generation")
    // and the auto-compacted artifact IS the from-scratch build over
    // everything ingested (quantizer determinism — recall after the
    // cadence rebuild is exactly the designed-index recall, the
    // drift-bound the maintenance exists to enforce)
    val fresh = freshPath()
    AnnIndex.write(emb, fresh)
    assertSameIndex(AnnIndex.read(spark, path), AnnIndex.read(spark, fresh))
    // compactEvery = 0 keeps maintenance fully manual
    AnnIndex.appendAndMaybeCompact(
      emb.filter(col("vec_id") % 50 === 0).limit(3)
        .withColumn("vec_id", -col("vec_id") - 1), path, compactEvery = 0)
    assert(AnnIndex.pendingAppends(spark, path) === 1)
    graft.core.CacheScope.releaseAll()
  }

  test("nprobe widens the scan monotonically; nprobe = k IS brute force") {
    import graft.ext.Similarity
    import graft.queries.SimilarityQueries.snapped
    val path = freshPath()
    AnnIndex.write(emb, path)
    val probes = emb.filter(col("vec_id") % 50 === 0)
    def pairs(np: Int) = AnnIndex.query(probes, path, 3, np)
      .select(col("probe_id"), col("neighbor_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth: brute-force cosine top-3 (the y1 shape)
    val pSnap = snapped(probes, "probe_id", "pv", "pn")
    val exact = graft.ops.TopK.perKey(
        snapped(emb, "neighbor_id", "nv", "nn")
          .join(broadcast(pSnap), col("probe_id") =!= col("neighbor_id"))
          .withColumn("cos", Similarity.cosineFromSnapped(
            col("pv"), col("nv"), col("pn"), col("nn")))
          .select(col("probe_id"), col("neighbor_id"), col("cos")),
        Seq("probe_id"), Seq("cos" -> true, "neighbor_id" -> false), 3)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = pairs(1); val r4 = pairs(4); val rAll = pairs(16)
    def hits(s: Set[(Long, Long)]) = (s intersect exact).size
    assert(hits(r1) <= hits(r4) && hits(r4) <= hits(rAll),
      "recall must be monotone in nprobe")
    // scanning every cell leaves nothing approximate
    assert(rAll === exact)
    graft.core.CacheScope.releaseAll()
  }

  test("the stored quantizer never contains an empty cell, even under drift") {
    // drift-shaped fixture (the ProfileAnnDrift shape): a domain-shifted
    // slice pulls Lloyd centroids far enough that a seed cell can end
    // the final assignment round EMPTY — its centroid must not be
    // stored, or probes arg-minning into it would scan zero candidates
    val path = freshPath()
    val shifted = emb.filter(col("vec_id") % 5 === 0)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.5).cast("float")))
    AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 0).unionByName(shifted), path)
    val index = AnnIndex.read(spark, path)
    val emptyCells = AnnIndex.centroids(index).join(
      AnnIndex.vectors(index).select(col("cell").as("c_id")).distinct(),
      Seq("c_id"), "left_anti").count()
    assert(emptyCells === 0, "stored centroids must all have member vectors")
    // consequence: every probe's nprobe=1 query has a non-empty scan
    val perProbe = AnnIndex.query(shifted, path, 3)
      .groupBy(col("probe_id")).count()
    assert(perProbe.filter(col("count") === 0).count() === 0)
    graft.core.CacheScope.releaseAll()
  }

  test("compact refuses an artifact that is not an AnnIndex") {
    val path = freshPath()
    graft.core.IndexStore.ensure(spark, path) { scratch =>
      spark.range(5).toDF("id").write.parquet(scratch)
    }
    val e = intercept[IllegalArgumentException] {
      AnnIndex.compact(spark, path)
    }
    assert(e.getMessage.contains("AnnIndex"))
    assert(spark.read.parquet(path).count() === 5)
  }

  test("sample-fit occupancy guard bounds the hottest cell (ProbeSampleFit shape)") {
    import spark.implicits._
    // the ProbeSampleFit fixture shape in miniature: 80% of the mass in
    // one dense (jittered) region, 20% elsewhere — a k=2 sample fit
    // hands the dense region to one centroid and its cell goes hot
    val rows =
      (0 until 320).map(i => (i.toLong, Array(1f, 0.001f * i, 0f, 0f))) ++
      (320 until 400).map(i => (i.toLong, Array(0f, 0f, 1f, 0.001f * (i - 320))))
    val syn = rows.toDF("vec_id", "embedding")
    val p0 = freshPath()
    val unguarded = AnnIndex.writeSampleFit(syn, p0, k = 2, lloydIters = 1,
      sampleStride = 4, maxCellShare = 1.0)
    assert(unguarded > 0.5, s"fixture must produce a hot cell, got $unguarded")
    assert(AnnIndex.vectors(AnnIndex.read(spark, p0)).count() === 400)

    val p1 = freshPath()
    val guarded = AnnIndex.writeSampleFit(syn, p1, k = 2, lloydIters = 1,
      sampleStride = 4, maxCellShare = 0.5, extraLloydRounds = 1, maxSplits = 8)
    assert(guarded <= 0.5, s"guard must bound the hottest cell, got $guarded")
    val idx = AnnIndex.read(spark, p1)
    // splits extend the dense id range; every vector survives, and every
    // assigned cell has its centroid row in the same atomic artifact
    assert(AnnIndex.vectors(idx).count() === 400)
    assert(AnnIndex.vectors(idx).select(col("cell").as("c_id")).distinct()
      .join(AnnIndex.centroids(idx), Seq("c_id"), "left_anti").count() === 0)
    // the guarded artifact still serves queries through the normal path
    assert(AnnIndex.query(syn.filter(col("vec_id") % 50 === 0), p1).count() > 0)
    graft.core.CacheScope.releaseAll()
  }

  test("split-round delta reassignment is bit-identical to a full reassignment") {
    import spark.implicits._
    // r14 verdict #4: a split changes only the two sub-centroids, so the
    // guard now reassigns by DELTA (current-vs-subs on the corpus, full
    // argmin on the hot cell's members) instead of a K·N pass per round.
    // The pin: on a fixture where splits genuinely fire, the PUBLISHED
    // assignment must equal a from-scratch assignToCells over the
    // PUBLISHED centroids — which is exactly what the full reassignment
    // produced, tie-breaks included.
    val rows =
      (0 until 320).map(i => (i.toLong, Array(1f, 0.001f * i, 0f, 0f))) ++
      (320 until 400).map(i => (i.toLong, Array(0f, 0f, 1f, 0.001f * (i - 320))))
    val syn = rows.toDF("vec_id", "embedding")
    val snapped = graft.queries.SimilarityQueries
      .snapped(syn, "vec_id", "sv", "nrm")
    def build(delta: Boolean): (String, Double) = {
      val p = freshPath()
      val share = AnnIndex.sampleFitFrom(snapped, p, k = 2, lloydIters = 1,
        sampleStride = 4, maxCellShare = 0.5, extraLloydRounds = 0,
        maxSplits = 8, splitDelta = Some(delta))
      (p, share)
    }
    val (pDelta, shareDelta) = build(delta = true)
    val (pFull, shareFull) = build(delta = false)
    assert(shareDelta <= 0.5,
      s"splits must have fired and bounded the cell: $shareDelta")
    assert(shareDelta === shareFull)
    // the two strategies publish IDENTICAL artifacts, row for row
    assertSameIndex(AnnIndex.read(spark, pDelta), AnnIndex.read(spark, pFull))
    val idx = AnnIndex.read(spark, pDelta)
    val cents = AnnIndex.centroids(idx)
    assert(cents.count() > 2, "the guard must have split beyond the seed k")
    val k = cents.agg(max(col("c_id"))).head().getLong(0).toInt + 1
    val full = graft.queries.SimilarityQueries.assignToCells(
        AnnIndex.vectors(idx).select(col("vec_id"), col("sv"), col("nrm")),
        cents, k)
      .select(col("vec_id"), col("cell"))
    val stored = AnnIndex.vectors(idx).select(col("vec_id"), col("cell"))
    assert(stored.exceptAll(full).isEmpty && full.exceptAll(stored).isEmpty,
      "delta-reassigned cells must equal the full argmin, ties included")
    graft.core.CacheScope.releaseAll()
  }

  test("compactSampleFit at stride 1 EQUALS the full compact; guarded form bounds and bumps generation") {
    // stride = 1 makes the "sample" the whole corpus, so the sample-fit
    // rewrite must reproduce the full compact bit for bit — the same
    // determinism identity compact() pins against a from-scratch write
    val (pa, pb) = (freshPath(), freshPath())
    val initial = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    AnnIndex.write(initial, pa); AnnIndex.append(batch, pa)
    AnnIndex.write(initial, pb); AnnIndex.append(batch, pb)
    AnnIndex.compact(spark, pa)
    AnnIndex.compactSampleFit(spark, pb, sampleStride = 1)
    assertSameIndex(AnnIndex.read(spark, pa), AnnIndex.read(spark, pb))

    // the guarded sampled form: same maintenance contract — every vector
    // survives, the quantizer generation bumps (standing streams fail
    // loud), and the returned share is the published index's own
    val pc = freshPath()
    AnnIndex.write(initial, pc); AnnIndex.append(batch, pc)
    val genBefore = AnnIndex.generation(spark, pc)
    val share = AnnIndex.compactSampleFit(spark, pc, sampleStride = 4,
      maxCellShare = 0.5)
    val idx = AnnIndex.read(spark, pc)
    assert(AnnIndex.vectors(idx).count() === emb.count())
    assert(AnnIndex.generation(spark, pc) !== genBefore)
    val hot = AnnIndex.vectors(idx).groupBy(col("cell")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(math.abs(share - hot.toDouble / emb.count()) < 1e-9,
      "the returned share must be the published index's hottest share")
    assert(share <= 0.5, s"guard must bound the rebuilt occupancy, got $share")
    graft.core.CacheScope.releaseAll()
  }

  test("unsplittable identical-vector mass publishes with the share returned, not an outage") {
    import spark.implicits._
    // 300 IDENTICAL vectors: sub-centroids of identical members coincide
    // and the tie-break reunites the cell — no quantizer can split this
    // (it's upstream dedup's job). The guard must exhaust its splits,
    // still publish, and hand the caller the honest share as its gate.
    val rows = (0 until 300).map(i => (i.toLong, Array(1f, 0f))) ++
               (300 until 400).map(i => (i.toLong, Array(0f, 1f)))
    val syn = rows.toDF("vec_id", "embedding")
    val p = freshPath()
    val share = AnnIndex.writeSampleFit(syn, p, k = 2, lloydIters = 1,
      sampleStride = 4, maxCellShare = 0.5, extraLloydRounds = 1, maxSplits = 4)
    assert(share > 0.5, "identical mass cannot be split by any quantizer")
    assert(AnnIndex.vectors(AnnIndex.read(spark, p)).count() === 400)
    graft.core.CacheScope.releaseAll()
  }
}
