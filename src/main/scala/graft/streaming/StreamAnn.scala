package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}

/** Streaming ANN screen — the vector-side twin of
  * [[StreamDedup.againstIndex]]: score a stream of new embeddings
  * (vec_id, embedding) against the committed IVF index
  * ([[graft.ext.AnnIndex]]) and emit every standing neighbor with
  * cosine >= `minCos`, as vectors ARRIVE rather than in a nightly
  * batch.
  *
  * Entirely STATELESS (append mode, no watermark, no state store):
  * the static index is the state. The one piece that cannot run as a
  * streaming plan is the quantizer — [[AnnIndex.probeCells]] is an
  * aggregation (argmin over the K-way centroid fan-out), and
  * aggregates need update/complete mode. But K centroids are a
  * broadcast-sized STATIC artifact, so they are collected ONCE at
  * stream construction and folded into the projection as literals —
  * per-row quantization becomes a pure codegen'd expression (the
  * bloomScreen precedent: tiny static state embedded in the plan).
  * Cell selection is `slice(array_sort(struct(dist, cell)), 1,
  * nprobe)` — exact int64 distances, (dist, cell) ordering — which is
  * bit-for-bit [[AnnIndex.probeCells]]' ranking, so the stream output
  * equals the batch [[AnnIndex.screen]] row for row (spec-asserted
  * differentially in `StreamAnnSpec`).
  *
  * Per-micro-batch work: the stream-side projection plus one
  * stream-static equi-join on cell against the persisted vector rows
  * (cached at stream construction — each micro-batch reads the cached
  * frame, never re-scans the index). Candidates are cell-bounded
  * (~ nprobe × avg cell per probe). After an [[AnnIndex.compact]]
  * the query must be RESTARTED to pick up the new quantizer — the
  * collected centroids are plan literals by design; a long-running
  * screen restarting from its checkpoint resumes exactly-once
  * (`RecoverySpec`). */
object StreamAnn {

  def againstIndex(stream: DataFrame, indexPath: String,
                   minCos: Double, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val spark = stream.sparkSession
    val index = AnnIndex.read(spark, indexPath)
    // K kept centroids -> driver, once, at stream construction
    val cents: Array[(Long, Seq[Long])] = AnnIndex.centroids(index)
      .select(col("c_id"), col("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(cents.nonEmpty, s"no centroid rows at $indexPath")
    val np = math.min(nprobe, cents.length)
    // static build side of the stream-static join, cached once
    val vecs = graft.core.CacheScope.track(
      AnnIndex.vectors(index)
        .select(col("vec_id").as("neighbor_id"), col("sv").as("nv"),
          col("nrm").as("nn"), col("cell"))
        .persist())
    val probes = stream.select(col("vec_id").as("probe_id"),
        Similarity.snapVec(col("embedding")).as("pv"))
      .withColumn("pn", Similarity.normSnapped(col("pv")))
    // per-row quantizer: exact int64 L2 against each literal centroid,
    // (dist, cell) sort — probeCells' ordering — then the nprobe prefix
    val ranked: Column = array(cents.map { case (cid, cv) =>
      struct(
        graft.functions.L2DistanceLong.l2_long(col("pv"), typedlit(cv)).as("dist"),
        lit(cid).as("cell"))
    }: _*)
    probes
      .withColumn("__cell", explode(slice(array_sort(ranked), 1, np)))
      .select(col("probe_id"), col("pv"), col("pn"),
        col("__cell.cell").as("cell"))
      .join(vecs, "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineFromSnapped(
        col("pv"), col("nv"), col("pn"), col("nn")))
      .filter(col("cos") >= minCos)
      .select(col("probe_id"), col("neighbor_id"),
        col("cell").cast("long").as("cell"), col("cos"))
  }
}
