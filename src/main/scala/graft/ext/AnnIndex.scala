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

  /** Quantizer GENERATION sidecar: a fresh id written beside the data
    * by every quantizer (re)build — [[write]] and [[compact]], NOT
    * [[append]] (appends reuse the standing quantizer, so consumers
    * holding its centroids stay valid). A long-running stream that
    * baked the centroids in as plan literals ([[graft.streaming
    * .StreamAnn]]) checks this id per micro-batch and fails loud when
    * a compact swapped the quantizer underneath it — without the
    * check it would silently quantize probes with the OLD centroids
    * against rows assigned by the NEW ones and lose recall unbounded.
    * Underscore-prefixed so parquet scans ignore it; it travels with
    * the directory through [[graft.core.IndexStore.replace]]'s atomic
    * swap, so generation and rows can never be torn. */
  private val GenFile = "_graft_ann_gen"

  /** The committed quantizer generation, None for pre-generation
    * artifacts (guards treat a None→Some transition as a change). */
  def generation(spark: SparkSession, path: String): Option[String] =
    readGeneration(path, spark.sessionState.newHadoopConf())

  /** Conf-explicit form, callable from executors (the stream guard
    * re-reads per micro-batch with a default Hadoop conf — index
    * paths on shared storage carry their scheme, so the default conf
    * resolves the same filesystem the driver wrote through). */
  private[graft] def readGeneration(
      path: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] =
    readSidecar(path, GenFile, conf)

  private def writeGeneration(spark: SparkSession, path: String): Unit =
    writeSidecar(spark, path, GenFile, java.util.UUID.randomUUID().toString)

  /** Sidecar read/write — the underscore-file protocol is owned by
    * [[graft.core.IndexStore]] (one implementation for the ANN and
    * codes tiers); these are thin local names for the two shapes this
    * file speaks. */
  private def readSidecar(path: String, name: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] =
    graft.core.IndexStore.readSidecarOpt(path, name, conf)
  private def writeSidecar(spark: SparkSession, path: String,
                           name: String, value: String): Unit =
    graft.core.IndexStore.writeSidecar(spark, path, name, value)

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
    * cells and stored quantizer can never disagree — MINUS cells the
    * final round left EMPTY (Lloyd moved a centroid off its members).
    * An empty cell's centroid must not be stored: a PROBE whose argmin
    * is an empty cell would scan zero candidates even though a
    * populated near cell exists (measured in ProfileAnnDrift before
    * this filter: 16% of drifted probes hit one empty cell and nprobe=1
    * recall fell off a cliff). Dropping it can't orphan any stored
    * vector — a vector assigned there would make the cell non-empty —
    * and is the standard production-quantizer behavior. */
  private def buildFrom(vecs: DataFrame, path: String, k: Int,
                        lloydIters: Int): Unit = {
    // Persists are UNPERSISTED EAGERLY once the artifact is written —
    // not left to CacheScope. When [[compact]] calls this, `vecs` is a
    // plan rooted at the index path being replaced; a persist that
    // outlived the swap would SHADOW every later read of that path in
    // this session (Spark's CacheManager substitutes matching plan
    // subtrees with the cached — now stale — rows, which surfaced as
    // post-compaction queries still seeing the pre-compaction cells).
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    try {
      val v = hold(vecs)
      var cents = seedCentroids(v, k)
      var assigned = assignToCells(v, cents, k)
      for (_ <- 0 until lloydIters) {
        cents = hold(lloydRefine(assigned))
        assigned = assignToCells(v, cents, k)
      }
      val a = hold(assigned)
      val centsKept = cents.join(
        a.select(col("cell").as("c_id")).distinct(), Seq("c_id"), "left_semi")
      rows(a, centsKept).write.mode("overwrite").parquet(path)
      // a (re)built quantizer is a NEW generation — streams holding the
      // old centroids as plan literals must fail loud, not lose recall
      writeGeneration(vecs.sparkSession, path)
    } finally persisted.foreach(_.unpersist())
  }

  /** Build the index from an embeddings-shaped frame (vec_id,
    * embedding). Race-safe build-if-absent callers go through
    * [[graft.core.IndexStore.ensure]] with this as the build closure. */
  def write(emb: DataFrame, path: String, k: Int = K_DEFAULT,
            lloydIters: Int = 1): Unit =
    buildFrom(snapped(emb, "vec_id", "sv", "nrm"), path, k, lloydIters)

  /** [[write]] in the PRODUCTION TRAINING FORM (the y18 recipe): fit
    * the quantizer on the `vec_id % sampleStride = 0` hash slice,
    * assign the FULL corpus once — ProbeSampleFit measured the
    * training cut at ~7× with the honest cost being cell-OCCUPANCY
    * spread (the sample under-represents dense regions, so one
    * centroid can end up owning a 2.4×-hot cell; scan cost then
    * concentrates on whichever tasks own it).
    *
    * `maxCellShare` is the occupancy GUARD that cost demanded (r13
    * verdict #6): after the full-corpus assignment, if the hottest
    * cell holds more than that share of all vectors, the guard
    * (a) runs up to `extraLloydRounds` additional Lloyd rounds on the
    * SAMPLE — cheap, fixes seed-placement imbalance — and, if the cell
    * is still hot, (b) SPLITS it: the hot centroid is replaced by two
    * sub-centroids fitted (hash-ordered seed + one Lloyd round) on the
    * hot cell's own sample members, the new id extending the dense
    * range, up to `maxSplits` times. Every step is the same
    * deterministic exact-int64 machinery as the fits themselves.
    * Re-checks price one k-row aggregate over the already-computed
    * assignment. Corpus-pass accounting: each extra Lloyd round pays
    * one full K·N reassignment (every centroid moved); each SPLIT
    * round pays the measured-cheaper of the full argmin and the DELTA
    * (current-vs-two-subs plus a full argmin on the hot cell's own
    * members, ~(2+K·share)·N) — measurement and the shuffle-shape
    * reason the full pass wins at every tried width at
    * [[DeltaSplitMinK]]; both are bit-identical, spec-pinned. A split
    * that leaves the hottest
    * (cell, share) unchanged breaks the loop instead of burning the
    * remaining rounds on identical-vector mass no quantizer can
    * separate.
    *
    * Returns the FINAL hottest-cell share. The guard is best-effort
    * against QUANTIZER-induced imbalance: a corpus whose mass is
    * genuinely concentrated on (near-)identical vectors cannot be
    * split by any quantizer — sub-centroids of identical members
    * coincide and the tie-break reunites the cell — so on pathological
    * input the index still publishes (refusing would turn normal
    * duplicate mass into an outage) and the returned share is the
    * caller's gate. maxCellShare = 1.0 disables the guard and is
    * exactly y18's unguarded form. */
  def writeSampleFit(emb: DataFrame, path: String, k: Int = K_DEFAULT,
                     lloydIters: Int = 1, sampleStride: Int = 16,
                     maxCellShare: Double = 1.0,
                     extraLloydRounds: Int = 1, maxSplits: Int = 4): Double =
    sampleFitFrom(snapped(emb, "vec_id", "sv", "nrm"), path, k, lloydIters,
      sampleStride, maxCellShare, extraLloydRounds, maxSplits)

  /** Split-round reassignment strategy gate, MEASURED on the 200k /
    * 64-dim ladder (tools/ProbeSampleFit, BASELINE.md round 15): a
    * split changes only two centroids, so scoring the corpus against
    * the two subs and min-merging with the standing best is
    * ~(2+K·share)·N arithmetic instead of the full K·N argmin — the
    * r14 verdict's delta hypothesis. The measurement REFUTES it on
    * every width tried: the full argmin's min(struct) partial-
    * aggregates map-side, so its exchange carries exactly ONE slim row
    * per vector, while the delta min-merge unions standing-best + sub
    * + hot-member legs and exchanges ~2-3 rows per vector plus a
    * semi-join — fixed shuffle costs the saved arithmetic never
    * repays at this shape (guarded rebuild: +1.8 s at K=16, +1.8 s at
    * K=64, +0.3 s at K=256; the gap narrows as K·d arithmetic grows
    * but never crosses). Auto therefore always picks the full pass;
    * `splitDelta = Some(true)` is the opt-in for deployments where the
    * assignment is provably compute-bound (quantizer width × vector
    * dim well beyond this ladder's 256×64). Both strategies are
    * bit-identical — spec-pinned in AnnIndexSpec — so the choice is
    * cost-only. */
  private[graft] val DeltaSplitMinK = Int.MaxValue

  /** The guarded sample-fit core over ALREADY-SNAPPED (vec_id, sv, nrm)
    * rows — shared by [[writeSampleFit]] (snaps an embeddings frame)
    * and [[compactSampleFit]] (feeds the index's stored rows back, for
    * which a re-snap would double-scale). `splitDelta` overrides the
    * measured [[DeltaSplitMinK]] auto-choice (None) — spec/probe-only,
    * both strategies are bit-identical by construction. */
  private[graft] def sampleFitFrom(snappedVecs: DataFrame, path: String, k: Int,
                            lloydIters: Int, sampleStride: Int,
                            maxCellShare: Double,
                            extraLloydRounds: Int, maxSplits: Int,
                            splitDelta: Option[Boolean] = None): Double = {
    require(sampleStride >= 1, s"sampleStride must be >= 1, got $sampleStride")
    require(maxCellShare > 0.0 && maxCellShare <= 1.0,
      s"maxCellShare must be in (0, 1], got $maxCellShare")
    val spark = snappedVecs.sparkSession
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    // every guard round derives the next centroid frame FROM the
    // current one — left lazy, the plan tree doubles per round (the
    // filter + sub-fit branches each embed the whole previous plan) and
    // a handful of futile splits OOMs the driver on plan TEXT alone.
    // Centroids are K rows by construction, so each round lands them as
    // a local relation: bounded collect (the K-centroids-at-stream-
    // build precedent), flat lineage for every downstream plan.
    def landed(c: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(c.collect(): _*), c.schema)
    var assignedRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    try {
      val vecs = hold(snappedVecs)
      val total = vecs.count().toDouble
      val slice = hold(vecs.filter(col("vec_id") % sampleStride === 0))
      // loud-fail, not a NoSuchElementException three stages later: a
      // stride coprime to the stored id space (offset ids, all-odd
      // snowflakes, a corpus smaller than the stride) selects nothing,
      // and an empty sample would seed zero centroids and drop every
      // vector at assignment
      require(slice.count() > 0,
        s"vec_id % $sampleStride == 0 selects no vectors — the sample " +
          "stride does not divide this corpus's id space; pick a stride " +
          "that hits stored ids (1 = fit on everything)")
      var curK = k
      var cents = seedCentroids(slice, k)
      for (_ <- 0 until lloydIters)
        cents = lloydRefine(assignToCells(slice, cents, curK))
      cents = landed(cents)
      val l2 = graft.functions.L2DistanceLong.l2_long(col("sv"), col("cv"))
      // SLIM per-vector state, (vec_id, cell, dist) — the guard loop's
      // only round-carried fact. The wide (sv, nrm) arrays stay in the
      // persisted `vecs` frame and are NEVER round-materialized: the
      // first delta form landed the full wide assignment per round and
      // the Row<->InternalRow conversion of the vector arrays alone
      // cost more than the K·N arithmetic it saved (measured at the
      // 200k ladder — 34 s vs the full compact's 4.6). Landing the
      // 3-scalar state via the Dedup.materializeRound pattern keeps
      // lineage flat (each delta round reads the PREVIOUS state — left
      // lazy the plan tree compounds per round) at ~24 bytes/row.
      var state: DataFrame = null
      def landState(next0: DataFrame): Unit = {
        val r = next0.rdd
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count() // materialize BEFORE the predecessor it reads goes away
        val old = assignedRdd
        assignedRdd = r
        state = spark.createDataFrame(r, next0.schema)
        if (old != null) old.unpersist(false)
      }
      // K-way argmin with the distance KEPT (assignToCells drops it;
      // the delta rounds need it as the standing best) — same explode +
      // broadcast join + min(struct) partial agg, identical (dist, cell)
      // tie-break
      def fullAssignDist(v: DataFrame): DataFrame =
        v.withColumn("c_id", explode(sequence(lit(0L), lit(curK - 1L))))
          .join(broadcast(cents), "c_id")
          .withColumn("dist", l2)
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("c_id"))).as("m"))
          .select(col("vec_id"), col("m.c_id").as("cell"),
            col("m.dist").as("dist"))
      landState(fullAssignDist(vecs)) // the initial full assignment
      // (cell, share) of the hottest cell — k rows aggregated, the
      // deterministic max (count desc, cell asc)
      def hottest(): (Long, Double) = {
        val r = state.groupBy(col("cell")).count()
          .orderBy(col("count").desc, col("cell")).head()
        (r.getLong(0), r.getLong(1) / total)
      }
      // DELTA reassignment for a SPLIT round (r14 verdict #4): a split
      // changes exactly the two sub-centroids — every other centroid,
      // and therefore every other vector's standing best (cell, dist),
      // is untouched. A vector outside the hot cell can only move if a
      // sub beats its CURRENT distance (its previous argmin already
      // beat every other unchanged centroid, ties included — the
      // min(struct(dist, cell)) ordering is preserved verbatim, so the
      // result is bit-identical to a full argmin over the new centroid
      // frame, spec-pinned in AnnIndexSpec). Per round: 2·N sub
      // distances over the persisted vecs + a slim-row min-merge + a
      // full K-way argmin on the hot cell's own members only —
      // ~(2 + K·share)·N arithmetic instead of K·N. OPT-IN only: the
      // measured ladder verdict at DeltaSplitMinK is that the full
      // argmin's partial-agged single-row-per-vector exchange beats
      // this min-merge's 2-3 rows per vector at every width tried;
      // the arithmetic saving pays only where assignment is provably
      // compute-bound.
      def deltaReassign(oldHot: Long, subIds: Seq[Long]): Unit = {
        // the <=2 changed centroids, fanned like assignToCells fans all
        // K (the sub-fit may collapse to ONE centroid when both
        // sub-seeds snap identically — the inner join drops the id)
        val subFan = vecs
          .withColumn("c_id", explode(array(subIds.map(lit(_)): _*)))
          .join(broadcast(cents), "c_id")
          .withColumn("dist", l2)
          .select(col("vec_id"), col("c_id").as("cell"), col("dist"))
        // standing best for everyone still validly assigned
        val keepOld = state.filter(col("cell") =!= oldHot)
        // hot members lost their centroid: full argmin over the new set
        // (their ids broadcast back onto the persisted wide rows)
        val hotFull = fullAssignDist(vecs.join(
          broadcast(state.filter(col("cell") === oldHot).select(col("vec_id"))),
          "vec_id"))
        landState(keepOld.unionByName(subFan).unionByName(hotFull)
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cell"))).as("m"))
          .select(col("vec_id"), col("m.cell").as("cell"),
            col("m.dist").as("dist")))
      }
      var (hotCell, share) = hottest()
      var refits = 0
      while (share > maxCellShare && refits < extraLloydRounds) {
        cents = landed(lloydRefine(assignToCells(slice, cents, curK)))
        landState(fullAssignDist(vecs)) // a Lloyd round moves EVERY centroid
        val h = hottest(); hotCell = h._1; share = h._2
        refits += 1
      }
      var splits = 0
      var stalled = false
      while (share > maxCellShare && splits < maxSplits && !stalled) {
        // the hot cell's SAMPLE members carry enough geometry to place
        // the two sub-centroids; the corpus then pays only the delta
        // reassignment above
        val mem = assignToCells(slice, cents, curK)
          .filter(col("cell") === hotCell)
          .select(col("vec_id"), col("sv"), col("nrm")).persist()
        persisted += mem
        if (mem.count() < 2) { splits = maxSplits } // unsplittable: no sample mass
        else {
          val sub = lloydRefine(assignToCells(mem, seedCentroids(mem, 2), 2))
            .select(when(col("c_id") === 0L, lit(hotCell))
              .otherwise(lit(curK.toLong)).as("c_id"), col("cv"), col("cn"))
          cents = landed(cents.filter(col("c_id") =!= hotCell).unionByName(sub))
          val subIds = Seq(hotCell, curK.toLong)
          curK += 1
          // strategy by quantizer width (contract at DeltaSplitMinK):
          // both paths produce the identical assignment, spec-pinned
          if (splitDelta.getOrElse(curK >= DeltaSplitMinK))
            deltaReassign(hotCell, subIds)
          else landState(fullAssignDist(vecs))
          val h = hottest()
          // futile-split break (r14 advisor): identical-vector mass
          // makes the sub-centroids coincide and the (dist, c_id)
          // tie-break reunites the cell — the hot cell and its share
          // come back unchanged, and every further round would pay its
          // corpus pass (and a phantom centroid id) for nothing
          stalled = h._1 == hotCell && h._2 == share
          hotCell = h._1; share = h._2
          splits += 1
        }
      }
      // the published wide assignment: the slim state joined back onto
      // the persisted vectors — state IS the argmin under the final
      // centroids, so this equals (and is spec-pinned equal to) a
      // from-scratch assignToCells without paying another K·N pass
      val assigned = vecs.join(state.select(col("vec_id"), col("cell")), "vec_id")
        .select(col("vec_id"), col("sv"), col("nrm"), col("cell"))
      val centsKept = cents.join(
        assigned.select(col("cell").as("c_id")).distinct(), Seq("c_id"), "left_semi")
      rows(assigned, centsKept).write.mode("overwrite").parquet(path)
      writeGeneration(spark, path)
      share
    } finally {
      persisted.foreach(_.unpersist())
      if (assignedRdd != null) assignedRdd.unpersist(false)
    }
  }
  // (writeGeneration marks the scratch in compactSampleFit's case; the
  // replace swap moves the sidecar with the directory atomically)

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
    writePending(spark, path, pendingAppends(spark, path) + 1)
  }

  /** Batches appended since the quantizer was last (re)built — the
    * cadence counter [[appendAndMaybeCompact]] compacts against.
    * Sidecar-stored (underscore-prefixed, scan-invisible), absent = 0:
    * [[write]]/[[compact]] produce a fresh artifact with no counter,
    * which IS the reset. Single-maintainer like the rest of the
    * maintenance API; a torn counter degrades to 0 (one delayed
    * compaction), never to a wrong query answer. */
  private val PendingFile = "_graft_ann_pending"
  def pendingAppends(spark: SparkSession, path: String): Int =
    readSidecar(path, PendingFile, spark.sessionState.newHadoopConf())
      .flatMap(raw => scala.util.Try(raw.toInt).toOption)
      .getOrElse(0)
  private def writePending(spark: SparkSession, path: String, n: Int): Unit =
    writeSidecar(spark, path, PendingFile, n.toString)

  /** [[append]] with the MEASURED maintenance cadence built in — the
    * policy the upsert table's deltaAppender already has
    * ([[graft.streaming.StreamUpsert]]): append the batch, and once
    * `compactEvery` batches have accumulated since the last quantizer
    * build, run [[compact]]. Returns true when this call compacted.
    *
    * Sizing (tools/ProbeAnnCadence, BASELINE.md round-11): an appended
    * batch costs the index nothing at query time until occupancy
    * drifts — the tax is RECALL decay plus cell imbalance, not
    * per-file seconds (contrast the upsert table's flat ~0.03 s/delta
    * read tax) — so the cadence is sized from the probe's recall
    * ladder, not a latency target. Callers holding a RUNNING
    * [[graft.streaming.StreamAnn]] screen: a cadence compaction
    * changes the quantizer generation and fails that stream loud at
    * its next batch (by design — restart to adopt the new quantizer);
    * pick compactEvery to align with planned restarts, or 0 to keep
    * maintenance fully manual. At 100 TB, run the cadence rebuild as
    * [[compactSampleFit]] instead of [[compact]] — the sample fit cuts
    * the rebuild's Lloyd cost ~7x, and the occupancy guard keeps the
    * rebalance honest PROVIDED the caller sets `maxCellShare` below
    * 1.0 (e.g. 2·(1/k)): both sample-fit forms default the share to
    * 1.0 — the unguarded y18 oracle form — so a maintenance path that
    * wants the guard must pass the bound explicitly (r14 advisor). */
  def appendAndMaybeCompact(emb: DataFrame, path: String,
                            compactEvery: Int, lloydIters: Int = 1): Boolean = {
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    append(emb, path)
    val spark = emb.sparkSession
    val due = compactEvery > 0 && pendingAppends(spark, path) >= compactEvery
    if (due) compact(spark, path, lloydIters)
    due
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

  /** [[compact]] in the sample-fit form — the maintenance rewrite a
    * 100 TB index actually runs: the periodic quantizer rebuild is
    * exactly where full-corpus Lloyd hurts most (every cadence pays
    * K·N dot products per round over the whole index), and exactly
    * where the y18 training cut applies (fit on the stored rows'
    * vec_id % sampleStride slice, assign everything once). The
    * occupancy guard rides along: the rebuild that EXISTS to fix
    * drift-grown cell imbalance must not mint a sample-noise-hot cell
    * of its own. Same atomicity as [[compact]]
    * ([[graft.core.IndexStore.replace]]: old index readable throughout,
    * failed rebuild restores it, generation sidecar bumps so standing
    * streams fail loud) — only the fit inside the scratch build
    * changes. Returns the final hottest-cell share
    * ([[writeSampleFit]]'s contract: best-effort against
    * quantizer-induced imbalance, honest share back to the caller).
    *
    * COST CONTRACT, measured (ProbeSampleFit, 200k ladder): the sample
    * fit cuts the LLOYD passes (K·N/stride instead of K·N per round).
    * Guard rounds price two ways: each extra-Lloyd REFIT round pays a
    * full K·N corpus reassignment (every centroid moved); each SPLIT
    * round pays one occupancy-refresh pass — the full argmin by
    * default, the opt-in delta where assignment is provably
    * compute-bound (measured verdict at [[DeltaSplitMinK]]: the full
    * pass's map-side partial min makes it shuffle-optimal and it won
    * at every width tried). At demo dials
    * (lloydIters 1-3, guard firing refit+split, K=16) the full
    * [[compact]] remains cheaper (~6 vs ~12 s at 200k) because the
    * guard rounds themselves are corpus passes no strategy removes;
    * the sampled form wins when the Lloyd budget is large relative to
    * the guard rounds it triggers (production quantizers run 10-25
    * rounds) or when occupancy bounding is itself the requirement —
    * it spends a BOUNDED number of corpus-scale passes to deliver a
    * share-bounded quantizer, which no Lloyd budget guarantees. Guard
    * engagement caveat as at [[appendAndMaybeCompact]]: maxCellShare
    * defaults to 1.0 = disabled; pass a real bound on the maintenance
    * path. */
  def compactSampleFit(spark: SparkSession, path: String,
                       lloydIters: Int = 1, sampleStride: Int = 16,
                       maxCellShare: Double = 1.0,
                       extraLloydRounds: Int = 1,
                       maxSplits: Int = 4): Double = {
    val index = read(spark, path)
    require(Seq("kind", "id", "sv", "nrm", "cell").forall(index.columns.contains),
      s"no (kind, id, sv, nrm, cell) columns at $path — not an AnnIndex artifact")
    val k = kOf(centroids(index))
    var share = 1.0
    graft.core.IndexStore.replace(spark, path) { scratch =>
      // the stored rows are already snapped — writeSampleFit's snapped()
      // re-snap is the identity on them, so feeding the vector rows
      // back through the embeddings-shaped entry point would double-
      // scale; rebuild through the same guarded fit on the raw rows
      share = sampleFitFrom(vectors(index)
        .select(col("vec_id"), col("sv"), col("nrm")), scratch, k,
        lloydIters, sampleStride, maxCellShare, extraLloydRounds, maxSplits)
    }
    share
  }

  /** Query the committed index: quantize probes with the STORED
    * centroids (so probe cells match stored vector cells by
    * construction), equi-join on cell, exact int64 cosines, bounded-heap
    * top-k per probe. Probes are embeddings-shaped (vec_id, embedding).
    * Output: (probe_id, neighbor_id, cell, rank, cos).
    *
    * `nprobe` is the recall dial (the y11 precedent): each probe scans
    * its `nprobe` nearest cells instead of only the argmin cell. This
    * is what recovers recall when true neighbors straddle a cell
    * boundary — which is the NORMAL state right after a [[compact]]
    * rebalances an append-heavy region into several bounded cells
    * (measured in `tools/ProfileAnnDrift`: the stale quantizer scores a
    * drifted domain as one giant cell — high recall only because the
    * scan degenerates toward brute force — while the compacted index
    * needs nprobe > 1 to re-cross the new boundaries at a fraction of
    * the stale scan cost). Candidates stay cell-bounded: cost is ~
    * nprobe × avg cell, never the corpus. */
  def query(probes: DataFrame, path: String, topK: Int = 3,
            nprobe: Int = 1): DataFrame = {
    val spark = probes.sparkSession
    val index = read(spark, path)
    val p = probeCells(probes, path, nprobe)
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

  /** Threshold SCREEN against the committed index: every (probe,
    * stored-vector) pair in the probed cells with cosine >= `minCos` —
    * [[query]] without the top-k heap, the shape ingest pipelines
    * want ("is this new vector semantically near ANYTHING standing?").
    * Output: (probe_id, neighbor_id, cell, cos). Candidates are
    * cell-bounded (~ nprobe × avg cell per probe, never the corpus);
    * recall is the IVF recall at the chosen `nprobe` — same dial, same
    * caveats as [[query]]. [[graft.streaming.StreamAnn.againstIndex]]
    * is this operator's streaming twin (spec-asserted differentially,
    * same output row for row). */
  def screen(probes: DataFrame, path: String, minCos: Double,
             nprobe: Int = 1): DataFrame = {
    val spark = probes.sparkSession
    val index = read(spark, path)
    val p = probeCells(probes, path, nprobe)
    vectors(index)
      .select(col("vec_id").as("neighbor_id"), col("sv").as("nv"),
        col("nrm").as("nn"), col("cell"))
      .join(p, "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosineFromSnapped(
        col("pv"), col("nv"), col("pn"), col("nn")))
      .filter(col("cos") >= minCos)
      .select(col("probe_id"), col("neighbor_id"),
        col("cell").cast("long").as("cell"), col("cos"))
  }

  /** The probe→cell selection [[query]] scans with: each probe's
    * `nprobe` nearest stored centroids by exact int64 L2 —
    * (probe_id, pv, pn, cell), one row per probed cell. Exposed so
    * measurement (ProfileAnnDrift's scan-cost accounting) and custom
    * consumers share the query's own selection instead of
    * re-deriving it. nprobe = 1 is the plain argmin assignment
    * (map-side `min_by` agg); nprobe > 1 keeps a bounded heap of
    * nprobe cells per probe over the same K-way broadcast fan-out. */
  def probeCells(probes: DataFrame, path: String, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cents = centroids(read(probes.sparkSession, path))
    val pSnap = snapped(probes, "vec_id", "sv", "nrm")
    if (nprobe == 1)
      assignToCells(pSnap, cents, kOf(cents))
        .select(col("vec_id").as("probe_id"), col("sv").as("pv"),
          col("nrm").as("pn"), col("cell"))
    else {
      val l2 = graft.functions.L2DistanceLong.l2_long(col("sv"), col("cv"))
      val ranked = pSnap
        .withColumn("c_id", explode(sequence(lit(0L), lit(kOf(cents) - 1L))))
        .join(broadcast(cents), "c_id")
        .withColumn("dist", l2)
        .select(col("vec_id").as("probe_id"), col("sv").as("pv"),
          col("nrm").as("pn"), col("c_id").as("cell"), col("dist"))
      graft.ops.TopK.perKey(ranked, Seq("probe_id"),
          Seq("dist" -> false, "cell" -> false), nprobe)
        .select(col("probe_id"), col("pv"), col("pn"), col("cell"))
    }
  }
}
