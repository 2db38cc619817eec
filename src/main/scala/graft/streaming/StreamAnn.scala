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
  * collected centroids are plan literals by design, and that contract
  * is ENFORCED: the quantizer generation id committed with the index
  * ([[AnnIndex.generation]]) is captured at stream construction and
  * re-checked per micro-batch by [[QuantizerGenGuard]] on the probe
  * path — a compact under a running screen fails the query loud
  * instead of silently quantizing probes with stale centroids against
  * rows the new quantizer assigned. A restarted query re-collects the
  * new centroids and resumes exactly-once from its checkpoint
  * (`RecoverySpec`). */
object StreamAnn {

  def againstIndex(stream: DataFrame, indexPath: String,
                   minCos: Double, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val spark = stream.sparkSession
    val index = AnnIndex.read(spark, indexPath)
    val expectedGen = AnnIndex.generation(spark, indexPath)
    // K kept centroids -> driver, once, at stream construction
    val cents: Array[(Long, Seq[Long])] = AnnIndex.centroids(index)
      .select(col("c_id"), col("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(cents.nonEmpty, s"no centroid rows at $indexPath")
    val np = math.min(nprobe, cents.length)
    // static build side of the stream-static join, cached once —
    // MATERIALIZED EAGERLY (count), not just marked: a lazily-filled
    // cache would leave later micro-batches re-reading index files
    // that a concurrent compact has already swapped away, surfacing as
    // a file-not-found mid-join instead of the generation guard's
    // loud, actionable failure at the batch boundary
    val vecs = graft.core.CacheScope.track(
      AnnIndex.vectors(index)
        .select(col("vec_id").as("neighbor_id"), col("sv").as("nv"),
          col("nrm").as("nn"), col("cell"))
        .persist())
    vecs.count()
    // generation guard on the PROBE path: one sidecar read per task
    // per stage (stages are fresh every micro-batch), rows only pass
    // while the committed quantizer is still the constructed one. A
    // Scala UDF breaks codegen only on the batch-sized probe
    // projection, never on the index side. The DRIVER's hadoop conf is
    // captured here (serializable wrapper, closure-shipped) — a bare
    // `new Configuration()` on the executor ignores spark.hadoop.*
    // session settings (s3a credentials, fs.defaultFS) and would fail
    // or resolve the wrong filesystem on clusters whose FS config
    // comes from Spark conf rather than executor-classpath XML.
    val hconf = new graft.core.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val genGuard = udf((p: String, expected: String) => {
      QuantizerGenGuard.check(p, Option(expected).filter(_.nonEmpty), hconf.value)
      true
    })
    val probes = stream.select(col("vec_id").as("probe_id"),
        Similarity.snapVec(col("embedding")).as("pv"))
      .filter(genGuard(lit(indexPath), lit(expectedGen.getOrElse(""))))
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

/** Executor-side quantizer-generation check for [[StreamAnn]]. One
  * sidecar read per (index path, stage) per JVM: stage ids are fresh
  * every micro-batch, so a quantizer swap is detected at the NEXT
  * batch boundary — before any row quantized with stale centroids is
  * emitted — while steady-state cost stays one tiny FS read per task
  * set. The memo is cleared when it grows past a bound (stage ids
  * never repeat, so eviction only re-checks). */
object QuantizerGenGuard {
  private val checked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  def check(indexPath: String, expected: Option[String],
            conf: org.apache.hadoop.conf.Configuration): Unit = {
    val stage = Option(org.apache.spark.TaskContext.get())
      .map(_.stageId()).getOrElse(-1)
    val key = (indexPath, stage)
    if (!checked.contains(key)) {
      val current = graft.ext.AnnIndex.readGeneration(indexPath, conf)
      if (current != expected) throw new IllegalStateException(
        s"ANN index at $indexPath was recompacted under a running " +
          s"stream: quantizer generation changed from " +
          s"${expected.getOrElse("<none>")} to " +
          s"${current.getOrElse("<none>")} — the stream's centroids " +
          "are plan literals; restart the query to pick up the new " +
          "quantizer")
      if (checked.size > 4096) checked.clear()
      checked.add(key)
    }
  }
}
