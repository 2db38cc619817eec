package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries.{assignToCells, lloydRefine, seedCentroids, snapped}

/** Maintained IVF (coarse-quantized) ANN index — the vector-side
  * analog of the near-dup index lifecycle (`Dedup.writeNeardupIndex` /
  * `appendToNeardupIndex` / `compactNeardupIndex`): build once, append
  * per ingest, periodically REWRITE when the appended mass has drifted
  * away from the centroids the index was built with.
  *
  * Why maintenance exists at all (the drift story): an IVF index is
  * only as good as its quantizer. [[append]] assigns new vectors to the
  * STANDING centroids — the only sane per-ingest cost (centroid
  * recomputation is a corpus-wide job) and the assignment stays
  * mutually consistent (probes use the same standing centroids, so a
  * probe and its appended near-neighbor land by the same rule). But as
  * appended batches accumulate, the centroids no longer summarize the
  * data: cells grow unbalanced (scan cost concentrates) and true
  * neighbors increasingly straddle cell boundaries that reflect the
  * ORIGINAL distribution, so nprobe=1 recall decays.
  * [[compact]] is the periodic rewrite: re-run the full quantizer
  * (hash-ordered seed + Lloyd rounds) over the index's CURRENT vector
  * rows — already snapped, no re-read of the source corpus — and
  * republish atomically via [[graft.core.IndexStore.replace]] (old
  * index readable throughout; failed rebuild restores it;
  * single-maintainer contract as documented there).
  *
  * Determinism, the property the spec leans on: the quantizer is
  * hash-ordered-seeded and exact-int64 throughout (see
  * `SimilarityQueries.seedCentroids`), so compacting an append-grown
  * index produces EXACTLY the index a from-scratch [[write]] over the
  * combined corpus produces — the ANN analog of the d14 star-forest
  * label equality.
  *
  * Storage: one parquet dataset, one commit marker. Centroid rows ride
  * with vector rows under a `kind` discriminator ('v' vector / 'c'
  * centroid) in a shared (kind, id, sv, nrm, cell) schema — vectors
  * carry their assigned cell; centroids carry cell = their own id. Both
  * consumers column-prune through the same scan, and the quantizer that
  * assigned the vectors is committed in the SAME atomic publish (a
  * separate centroid file could be torn against the vectors).
  *
  * 100 TB shape: every stage is bounded — K centroids broadcast,
  * assignment is a map-side `min_by` hash agg (one row per vector
  * before any exchange), Lloyd is the (cell, dim)-keyed exact-sum agg
  * that scales like y5's label centroids, and [[query]] joins on cell
  * so candidates are cell-bounded, never the corpus. */
object AnnIndex {

  private val K_DEFAULT = 16

  /** Vector rows of a read index: (vec_id, sv, nrm, cell). */
  def vectors(index: DataFrame): DataFrame =
    index.filter(col("kind") === "v")
      .select(col("id").as("vec_id"), col("sv"), col("nrm"), col("cell"))

  /** Centroid rows of a read index: (c_id, cv, cn). */
  def centroids(index: DataFrame): DataFrame =
    index.filter(col("kind") === "c")
      .select(col("id").as("c_id"), col("sv").as("cv"), col("nrm").as("cn"))

  private def rows(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned.select(lit("v").as("kind"), col("vec_id").as("id"),
        col("sv"), col("nrm"), col("cell"))
      .unionByName(cents.select(lit("c").as("kind"), col("c_id").as("id"),
        col("cv").as("sv"), col("cn").as("nrm"), col("c_id").as("cell")))

  /** Run the full quantizer over snapped (vec_id, sv, nrm) rows and
    * write the committed index layout to `path`. The centroids stored
    * are exactly the ones the LAST assignment round used, so stored
    * cells and stored quantizer can never disagree. */
  private def buildFrom(vecs: DataFrame, path: String, k: Int,
                        lloydIters: Int): Unit = {
    val v = graft.core.CacheScope.track(vecs.persist())
    var cents = seedCentroids(v, k)
    var assigned = assignToCells(v, cents, k)
    for (_ <- 0 until lloydIters) {
      cents = graft.core.CacheScope.track(lloydRefine(assigned).persist())
      assigned = assignToCells(v, cents, k)
    }
    rows(assigned, cents).write.mode("overwrite").parquet(path)
  }

  /** Build the index from an embeddings-shaped frame (vec_id,
    * embedding). Race-safe build-if-absent callers go through
    * [[graft.core.IndexStore.ensure]] with this as the build closure. */
  def write(emb: DataFrame, path: String, k: Int = K_DEFAULT,
            lloydIters: Int = 1): Unit =
    buildFrom(snapped(emb, "vec_id", "sv", "nrm"), path, k, lloydIters)

  /** Loud-fail read of a committed index. */
  def read(spark: SparkSession, path: String): DataFrame =
    graft.core.IndexStore.read(spark, path, "IVF ANN index", "AnnIndex.write")

  /** The stored quantizer's K dial: centroid ids are dense 0..k-1 at
    * build time but Lloyd may drop an emptied cell, so the k that
    * reproduces the assignment join is max(c_id) + 1, not the count. */
  private def kOf(cents: DataFrame): Int =
    cents.agg(max(col("c_id"))).head().getLong(0).toInt + 1

  /** Per-ingest maintenance: assign `emb`'s vectors to the STANDING
    * centroids and append the rows. Cost tracks the batch (K broadcast
    * centroids, one map-side argmin agg); the quantizer is deliberately
    * NOT updated — that is [[compact]]'s job, on a maintenance cadence.
    * Same append caveat as the near-dup index: what the batch makes
    * drifted, no stored row records — occupancy/drift is re-measured at
    * compaction. */
  def append(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val cents = centroids(read(spark, path))
    assignToCells(snapped(emb, "vec_id", "sv", "nrm"), cents, kOf(cents))
      .select(lit("v").as("kind"), col("vec_id").as("id"),
        col("sv"), col("nrm"), col("cell"))
      .write.mode("append").parquet(path)
  }

  /** The centroid-drift rewrite: re-run the quantizer over the index's
    * CURRENT vector rows (original build plus every append — already
    * snapped, the index is the whole input) and republish atomically
    * via [[graft.core.IndexStore.replace]]. Keeps the standing K dial.
    * By quantizer determinism the result equals a from-scratch
    * [[write]] over the combined corpus (spec-asserted row-for-row in
    * `AnnIndexSpec`). */
  def compact(spark: SparkSession, path: String, lloydIters: Int = 1): Unit = {
    val index = read(spark, path)
    require(Seq("kind", "id", "sv", "nrm", "cell").forall(index.columns.contains),
      s"no (kind, id, sv, nrm, cell) columns at $path — not an AnnIndex artifact")
    val k = kOf(centroids(index))
    // the rebuild plan reads `path` while it executes — safe, because
    // replace keeps the old artifact committed for the entire build and
    // only swaps after the scratch write has finished
    graft.core.IndexStore.replace(spark, path) { scratch =>
      buildFrom(vectors(index), scratch, k, lloydIters)
    }
  }

  /** Query the committed index: quantize probes with the STORED
    * centroids (so probe cells match stored vector cells by
    * construction), equi-join on cell, exact int64 cosines, bounded-heap
    * top-k per probe. Probes are embeddings-shaped (vec_id, embedding).
    * Output: (probe_id, neighbor_id, cell, rank, cos). */
  def query(probes: DataFrame, path: String, topK: Int = 3): DataFrame = {
    val spark = probes.sparkSession
    val index = read(spark, path)
    val cents = centroids(index)
    val p = assignToCells(snapped(probes, "vec_id", "sv", "nrm"),
        cents, kOf(cents))
      .select(col("vec_id").as("probe_id"), col("sv").as("pv"),
        col("nrm").as("pn"), col("cell"))
    val scored = vectors(index)
      .select(col("vec_id").as("neighbor_id"), col("sv").as("nv"),
        col("nrm").as("nn"), col("cell"))
      .join(p, "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineFromSnapped(
        col("pv"), col("nv"), col("pn"), col("nn")))
      .select(col("probe_id"), col("neighbor_id"), col("cell"), col("cos"))
    graft.ops.TopK.perKey(scored, Seq("probe_id"),
        Seq("cos" -> true, "neighbor_id" -> false), topK)
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .select(col("probe_id"), col("neighbor_id"),
        col("cell").cast("long").as("cell"), col("rank"), col("cos"))
  }
}
