package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PackBytesLong, UnpackBytesLong}
import graft.queries.SimilarityQueries.{pqCodebook, pqEncode, pqSubs}

/** Persisted QUANTIZED-VECTOR indexes in their production storage form:
  * codes byte-packed into a BinaryType column, quantization stats
  * riding in the artifact itself — never recomputed by a reader, never
  * torn from the codes they quantized (the [[AnnIndex]] sidecar/commit
  * discipline, applied to the compression tier).
  *
  * Why packing is the 100 TB shape (the y14 scaladoc's own note, made
  * real): the corpus-side scan of an ADC query touches ONLY the codes
  * column. Stored as ARRAY<BIGINT>, a 64-dim SQ8 vector costs 512 B of
  * scan; packed it is 64 B — the 8× payload cut IS the query-cost cut
  * at scale, and parquet's byte-array encoding keeps it that size on
  * disk. PQ codes shrink further: nSub bytes per vector (4 B at
  * nSub=4), a 128× cut vs snapped vectors.
  *
  * Decode cost: [[graft.functions.UnpackBytesLong]] is a native
  * codegen'd loop (no per-element lambda), so unpacking rides inside
  * whole-stage codegen on the read path.
  *
  * Determinism: both encoders are exact int64 (SQ8: (v−mn)·255 div
  * span; PQ: argmin over exact subvector L2), so a packed index equals
  * the inline pipeline bit-for-bit and the DuckDB oracles that rebuild
  * the quantization relationally stay hash-green against readers of
  * the packed form (CORRECTNESS: y9/y10/y14).
  *
  * Maintenance: like the IVF centroids ([[AnnIndex.compact]]), the
  * stats/codebook are what a compaction recomputes — append-grown
  * corpora drift away from the stored min/max (SQ8) or codebook (PQ),
  * degrading quantization error, not correctness of what is stored.
  * These artifacts are rebuilt via [[graft.core.IndexStore.replace]]
  * on the same cadence policy as AnnIndex (a full re-encode is a
  * corpus-wide job by nature — codes are functions of the stats). */
object CodesIndex {

  private[graft] def pack(codes: Column): Column =
    PackBytesLong.pack_bytes(codes)
  private[graft] def unpack(bin: Column): Column =
    UnpackBytesLong.unpack_bytes(bin)

  // ---- sidecar plumbing: one owner, graft.core.IndexStore -------------

  private def writeSidecar(spark: SparkSession, path: String,
                           name: String, value: String): Unit =
    graft.core.IndexStore.writeSidecar(spark, path, name, value)
  private def readSidecarOpt(spark: SparkSession, path: String,
                             name: String): Option[String] =
    graft.core.IndexStore.readSidecarOpt(spark, path, name)
  private def readSidecar(spark: SparkSession, path: String,
                          name: String): String =
    graft.core.IndexStore.readSidecar(spark, path, name)

  // ======================= SQ8 =======================================

  /** Stats sidecar: per-dimension min and span as two CSV lines —
    * 64+64 longs (~1 KB), the whole quantizer. Underscore-prefixed so
    * the parquet scan never sees it; travels with the directory
    * through IndexStore's atomic publish, so stats and codes can never
    * be torn. */
  private val Sq8StatsFile = "_graft_sq8_stats"

  final case class Sq8Stats(mn: Array[Long], span: Array[Long])

  /** Build the packed SQ8 index at `path`: per-dimension corpus
    * min/span (one posexplode + dims-row agg), every vector encoded
    * code_i = (v_i − mn_i)·255 div span_i and byte-packed —
    * (vec_id, codes BINARY) plus the stats sidecar. Callers wanting
    * race-safe build-if-absent go through IndexStore.ensure. */
  /** Encode snapped (vec_id, sv) rows against GIVEN stats, CLAMPED to
    * [0, 255]. At build time the stats are the exact corpus min/max so
    * the clamp is a no-op (every code lands in range by construction —
    * the relational oracles encode unclamped and still hash-match); on
    * the APPEND path it is the saturation a production SQ8 index
    * applies to out-of-distribution components — the value is pinned
    * to the range edge, carrying bounded error until the cadence
    * rebuild re-fits the stats (the drift story, same shape as
    * AnnIndex's recall decay). Without the clamp an out-of-range
    * component would fail PackBytesLong loudly — correct for a build,
    * wrong for ingest under drift. */
  private def sq8Encode(sv: DataFrame, mn: Array[Long],
                        span: Array[Long]): DataFrame =
    sv.select(col("vec_id"),
        lit(mn).as("__mn"), lit(span).as("__sp"), col("sv"))
      .select(col("vec_id"),
        pack(expr("""transform(sv, (x, i) ->
                    |  greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
                    |    (x - element_at(__mn, i + 1)) * CAST(255 AS BIGINT)
                    |      div element_at(__sp, i + 1))))""".stripMargin))
          .as("codes"))

  private def snappedIds(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), Similarity.snapVec(col("embedding")).as("sv"))

  def writeSq8(emb: DataFrame, path: String): Unit =
    writeSq8With(emb, path) { sv =>
      val dims = sv.select(posexplode(col("sv")).as(Seq("p", "v")))
        .groupBy(col("p")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .orderBy(col("p")).collect()
      (dims.map(_.getLong(1)),
        dims.map(r => math.max(r.getLong(2) - r.getLong(1), 1L)))
    }

  /** The ONE artifact writer both fit strategies share — snap/persist,
    * encode against the caller-derived (mn, span), write, stats
    * sidecar. Any artifact-layout or sidecar-format change happens
    * here, never per fit. */
  private def writeSq8With(emb: DataFrame, path: String)(
      statsOf: DataFrame => (Array[Long], Array[Long])): Unit = {
    val spark = emb.sparkSession
    val sv = graft.core.CacheScope.track(snappedIds(emb).persist())
    val (mn, span) = statsOf(sv)
    sq8Encode(sv, mn, span).write.mode("overwrite").parquet(path)
    writeSidecar(spark, path, Sq8StatsFile,
      mn.mkString(",") + "\n" + span.mkString(","))
    sv.unpersist()
  }

  /** [[writeSq8]] with percentile-CLIPPED stats — the robust fit for
    * heavy-tailed component distributions (measured in
    * tools/ProbeZipfR13): per-dim stats come from the (clip, 1−clip)
    * approximate quantiles instead of min/max, and the components
    * outside them SATURATE through [[sq8Encode]]'s clamp — exactly the
    * saturation the append path applies to out-of-distribution rows,
    * here accepted at FIT time. Trades bounded error on the tail for
    * full code resolution on the mass of the corpus; with raw min/max
    * a single outlier row stretches the span so the mass quantizes
    * into a handful of levels. */
  def writeSq8Clipped(emb: DataFrame, path: String, clip: Double): Unit = {
    require(clip > 0 && clip < 0.5, s"clip must be in (0, 0.5), got $clip")
    writeSq8With(emb, path) { sv =>
      val dims = sv.select(posexplode(col("sv")).as(Seq("p", "v")))
        .groupBy(col("p"))
        .agg(expr(s"approx_percentile(v, array($clip, ${1 - clip}))").as("q"))
        .orderBy(col("p")).collect()
      (dims.map(_.getSeq[Long](1).head),
        dims.map { r =>
          val q = r.getSeq[Long](1); math.max(q(1) - q(0), 1L)
        })
    }
  }

  // ---- SQ8 maintenance lifecycle (the AnnIndex append/compact policy
  // on the compression tier) ------------------------------------------

  /** Batches appended since the stats were last (re)fitted: the BATCH
    * path's sidecar counter (single-maintainer contract as documented
    * on AnnIndex.pendingAppends) PLUS the streaming path's committed
    * `batch<id>-*` files ([[streamedBatches]] — listing-derived, so
    * that path has no lost-increment window at all). A rebuild
    * produces a fresh artifact with neither counter nor batch files,
    * which IS the reset. */
  private val Sq8PendingFile = "_graft_sq8_pending"
  /** The raw batch-append counter alone — the value the bump path must
    * read-modify-write. Bumping the COMBINED [[sq8Pending]] would
    * re-absorb the streamed batch count into the counter on every
    * batch append of a mixed-ingest artifact (double counting that
    * compounds, firing cadence rebuilds early). */
  private def counterOf(spark: SparkSession, path: String,
                        file: String): Int =
    readSidecarOpt(spark, path, file)
      .flatMap(raw => scala.util.Try(raw.toInt).toOption).getOrElse(0)
  def sq8Pending(spark: SparkSession, path: String): Int =
    counterOf(spark, path, Sq8PendingFile) + streamedBatches(spark, path)

  /** Per-ingest maintenance: encode `emb`'s vectors against the
    * STANDING stats (never recomputed — a reader mixing codes from two
    * stats generations would decode garbage silently) and append the
    * packed rows. Out-of-range components saturate (see [[sq8Encode]]);
    * the stats are deliberately NOT updated — that is [[rebuildSq8]]'s
    * job, on a cadence.
    *
    * Concurrency contract (weaker than the streaming path's, stated):
    * this is a multi-file `mode(append)` parquet write plus a sidecar
    * counter bump — a scan running CONCURRENTLY with the append can
    * observe a torn batch (some part files visible, some not), and two
    * concurrent appenders can lose a counter increment. Single-writer,
    * no-concurrent-scan — the discipline of a scheduled batch ingest
    * job. An ingest that must be readable mid-append is what
    * [[appendSq8Batch]] / [[graft.streaming.StreamCodes]] exist for:
    * one file per batch, atomic-rename commit, pending derived from
    * the committed listing. */
  def appendSq8(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val st = sq8Stats(spark, path)
    sq8Encode(snappedIds(emb), st.mn, st.span)
      .write.mode("append").parquet(path)
    writeSidecar(spark, path, Sq8PendingFile,
      (counterOf(spark, path, Sq8PendingFile) + 1).toString)
  }

  /** One micro-batch's append for the STREAMING ingest
    * ([[graft.streaming.StreamCodes.sq8Appender]] — semantics and crash
    * windows documented there): encode against the standing stats into
    * `scratch` (hidden, one coalesced part file) and commit by a single
    * atomic rename to `batch<id>-<part>` inside the artifact dir.
    * Pending is NOT counter-bumped here — the committed `batch<id>-*`
    * file IS the increment ([[streamedBatches]] derives the count from
    * the listing), so there is no commit-to-count crash window and no
    * read-modify-write to lose. */
  private[graft] def appendSq8Batch(emb: DataFrame, path: String,
                                    scratch: org.apache.hadoop.fs.Path,
                                    batchId: Long): Unit = {
    val spark = emb.sparkSession
    val st = sq8Stats(spark, path)
    commitOneFileBatch(sq8Encode(snappedIds(emb), st.mn, st.span),
      path, scratch, batchId)
  }

  /** PQ twin of [[appendSq8Batch]]: encode against the STANDING
    * codebook (kind='v' rows only — the codebook is already committed
    * in the artifact) and rename-commit the one-file batch. */
  private[graft] def appendPqBatch(emb: DataFrame, path: String,
                                   scratch: org.apache.hadoop.fs.Path,
                                   batchId: Long): Unit = {
    val spark = emb.sparkSession
    val meta = pqMeta(spark, path)
    val cb = pqCodebookOf(spark, path)
    commitOneFileBatch(
      packedVectorRows(pqEncode(pqSubs(emb, meta.nSub, meta.subDim), cb)),
      path, scratch, batchId)
  }

  /** The shared rename-commit: write `encoded` as ONE part file under
    * `scratch` (hidden from scans of `path`), then move it into the
    * artifact as `batch<id>-<part>` with a single atomic rename — a
    * scan sees the micro-batch either not at all or complete. */
  private def commitOneFileBatch(encoded: DataFrame, path: String,
                                 scratch: org.apache.hadoop.fs.Path,
                                 batchId: Long): Unit = {
    val spark = encoded.sparkSession
    encoded.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val fs = scratch.getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(scratch).map(_.getPath)
      .filter(_.getName.startsWith("part-")) match {
        case Array(p) => p
        case other => sys.error(
          s"expected exactly one part file in $scratch, got ${other.length}")
      }
    // Hadoop rename reports failure by RETURNING FALSE, not throwing —
    // an unchecked false here would let the next line delete the only
    // copy of the encoded batch: silent at-most-once. Fail loud and
    // leave the scratch for inspection; the replay path clears it
    // before re-encoding.
    val committedName = new org.apache.hadoop.fs.Path(path,
      s"batch$batchId-${part.getName}")
    if (!fs.rename(part, committedName))
      sys.error(s"commit rename failed for micro-batch $batchId: " +
        s"$part -> $committedName (destination exists or FS error); " +
        "scratch left in place for the replay to clear")
    fs.delete(scratch, true)
  }

  /** Distinct micro-batches the STREAMING ingest has committed since
    * the artifact was last (re)built — derived from the `batch<id>-*`
    * listing, never a counter: the committed file is its own record,
    * so concurrent appenders cannot lose an increment and a crash
    * between commit and count cannot exist. A rebuild publishes a
    * fresh directory with no batch files, which IS the reset. */
  private[graft] def streamedBatches(spark: SparkSession,
                                     path: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0
    else Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "batch*-*"))).toSeq.flatten
      .map(_.getPath.getName.takeWhile(_ != '-')).distinct.size
  }

  /** The stats-drift rewrite: re-fit min/span and re-encode from
    * `source` — the CURRENT full corpus — and republish atomically via
    * IndexStore.replace (old artifact readable throughout). Unlike
    * [[AnnIndex.compact]], which rebuilds from the index's own rows
    * (it stores exact snapped vectors), SQ8 codes are LOSSY: re-fitting
    * stats from dequantized codes would compound quantization error, so
    * the rebuild re-reads the source corpus — which is also what a
    * production SQ8 refit does. */
  def rebuildSq8(spark: SparkSession, path: String, source: DataFrame): Unit =
    graft.core.IndexStore.replace(spark, path) { scratch =>
      writeSq8(source, scratch)
    }

  /** [[appendSq8]] with the cadence built in: once `rebuildEvery`
    * batches have accumulated since the last stats fit, [[rebuildSq8]]
    * runs over `source` (the caller's current-corpus frame — typically
    * base ∪ all appends). Returns true when this call rebuilt.
    * rebuildEvery = 0 keeps maintenance fully manual. */
  def appendAndMaybeRebuildSq8(emb: DataFrame, path: String,
                               source: => DataFrame,
                               rebuildEvery: Int): Boolean = {
    require(rebuildEvery >= 0, s"rebuildEvery must be >= 0, got $rebuildEvery")
    appendSq8(emb, path)
    val spark = emb.sparkSession
    val due = rebuildEvery > 0 && sq8Pending(spark, path) >= rebuildEvery
    if (due) rebuildSq8(spark, path, source)
    due
  }

  /** The committed quantizer — stats ride the index, readers never
    * recompute them (an independently recomputed min/max over an
    * APPENDED corpus would silently disagree with the stored codes). */
  def sq8Stats(spark: SparkSession, path: String): Sq8Stats = {
    val lines = readSidecar(spark, path, Sq8StatsFile).split("\n")
    require(lines.length == 2, s"malformed $Sq8StatsFile at $path")
    Sq8Stats(lines(0).split(",").map(_.toLong),
             lines(1).split(",").map(_.toLong))
  }

  /** Read + decode: (vec_id, dv) with dv_i = mn_i + code_i·span_i div
    * 255 — the dequantized corpus an asymmetric (ADC-style) query
    * ranks against. The scan reads vec_id + the packed BINARY column
    * only, and unpack+dequantize is ONE fused native loop
    * ([[graft.functions.Sq8DecodeLong]] — the HOF-transform form paid
    * per-component lambda interpretation; measured in ProbePacked). */
  def sq8Dequantized(spark: SparkSession, path: String): DataFrame = {
    val st = sq8Stats(spark, path)
    graft.core.IndexStore.read(spark, path, "SQ8 codes index", "CodesIndex.writeSq8")
      .select(col("vec_id"),
        graft.functions.Sq8DecodeLong.sq8_decode(
          col("codes"), lit(st.mn), lit(st.span)).as("dv"))
  }

  // ======================= PQ ========================================

  /** PQ meta sidecar: nSub,k,subDim — the shape a reader needs to
    * interpret the packed codes without guessing. */
  private val PqMetaFile = "_graft_pq_meta"

  final case class PqMeta(nSub: Int, k: Int, subDim: Int)

  /** Build the packed PQ index at `path`: the y9 encoder (subvector
    * split → broadcast codebook argmin, exact int64), codes packed
    * sub-order into an nSub-byte BINARY per vector. The CODEBOOK rides
    * as rows in the same artifact under a `kind` discriminator (the
    * AnnIndex centroid convention — the quantizer that produced the
    * codes commits in the same atomic publish):
    *   kind='v':  (id=vec_id, codes BINARY, sub/code/cv null)
    *   kind='cb': (id=code, sub, cv=codebook subvector)
    * Requires k <= 256 (a code must fit its byte). */
  /** Pack an encoded (vec_id, sub, code) frame into one BINARY row per
    * vector, codes in subspace order (array_sort on the (sub, code)
    * struct orders by sub first), shaped as kind='v' artifact rows. */
  private def packedVectorRows(encoded: DataFrame): DataFrame =
    encoded.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col("vec_id"), pack(expr("transform(sc, p -> p.code)")).as("codes"))
      .select(lit("v").as("kind"), col("vec_id").as("id"),
        col("codes"), lit(null).cast("long").as("sub"),
        lit(null).cast("long").as("code"),
        lit(null).cast("array<long>").as("cv"))

  def writePq(emb: DataFrame, path: String, nSub: Int = 4, k: Int = 16): Unit = {
    require(k <= 256, s"PQ codes are byte-packed: k must be <= 256, got $k")
    require(64 % nSub == 0, s"nSub must divide 64, got $nSub")
    val spark = emb.sparkSession
    val subDim = 64 / nSub
    val subs = graft.core.CacheScope.track(pqSubs(emb, nSub, subDim).persist())
    val cb = pqCodebook(subs, k)
    packedVectorRows(pqEncode(subs, cb))
      .unionByName(cb.select(lit("cb").as("kind"), col("code").as("id"),
        lit(null).cast("binary").as("codes"), col("sub"),
        col("code"), col("cv")))
      .write.mode("overwrite").parquet(path)
    writeSidecar(spark, path, PqMetaFile, s"$nSub,$k,$subDim")
    subs.unpersist()
  }

  /** PQ maintenance lifecycle — same policy as the SQ8 one above, with
    * one structural difference worth stating: an out-of-distribution
    * vector needs NO saturation here (the argmin over the standing
    * codebook always yields a valid code; drift shows up as growing
    * quantization distance, not a range violation), and the cadence
    * rebuild re-trains the codebook from the source corpus for the same
    * lossy-codes reason as SQ8's refit. */
  private val PqPendingFile = "_graft_pq_pending"
  def pqPending(spark: SparkSession, path: String): Int =
    counterOf(spark, path, PqPendingFile) + streamedBatches(spark, path)

  /** Encode `emb`'s vectors against the STANDING codebook and append
    * the packed rows; the codebook is deliberately not re-trained.
    * Same single-writer/no-concurrent-scan contract as [[appendSq8]]
    * (multi-file append + counter bump); the readable-mid-ingest form
    * is [[appendPqBatch]] / [[graft.streaming.StreamCodes.pqAppender]]. */
  def appendPq(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val meta = pqMeta(spark, path)
    val cb = pqCodebookOf(spark, path)
    packedVectorRows(pqEncode(pqSubs(emb, meta.nSub, meta.subDim), cb))
      .write.mode("append").parquet(path)
    writeSidecar(spark, path, PqPendingFile,
      (counterOf(spark, path, PqPendingFile) + 1).toString)
  }

  def rebuildPq(spark: SparkSession, path: String, source: DataFrame): Unit = {
    val meta = pqMeta(spark, path) // read BEFORE replace swaps the dir
    graft.core.IndexStore.replace(spark, path) { scratch =>
      writePq(source, scratch, meta.nSub, meta.k)
    }
  }

  def appendAndMaybeRebuildPq(emb: DataFrame, path: String,
                              source: => DataFrame,
                              rebuildEvery: Int): Boolean = {
    require(rebuildEvery >= 0, s"rebuildEvery must be >= 0, got $rebuildEvery")
    appendPq(emb, path)
    val spark = emb.sparkSession
    val due = rebuildEvery > 0 && pqPending(spark, path) >= rebuildEvery
    if (due) rebuildPq(spark, path, source)
    due
  }

  def pqMeta(spark: SparkSession, path: String): PqMeta = {
    val parts = readSidecar(spark, path, PqMetaFile).split(",")
    require(parts.length == 3, s"malformed $PqMetaFile at $path")
    PqMeta(parts(0).toInt, parts(1).toInt, parts(2).toInt)
  }

  private def readPq(spark: SparkSession, path: String): DataFrame =
    graft.core.IndexStore.read(spark, path, "PQ codes index", "CodesIndex.writePq")

  /** Codebook rows of a committed PQ index: (sub, code, cv). */
  def pqCodebookOf(spark: SparkSession, path: String): DataFrame =
    readPq(spark, path).filter(col("kind") === "cb")
      .select(col("sub"), col("code"), col("cv"))

  /** Unpacked code rows: (vec_id, sub, code) — posexplode over the
    * decoded BINARY, so the scan still reads only (id, codes). */
  def pqCodesOf(spark: SparkSession, path: String): DataFrame =
    readPq(spark, path).filter(col("kind") === "v")
      .select(col("id").as("vec_id"), unpack(col("codes")).as("c"))
      .select(col("vec_id"), posexplode(col("c")).as(Seq("sub", "code")))
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
}
