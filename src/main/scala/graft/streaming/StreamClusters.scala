package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Upsert}
import graft.core.IndexStore

/** Streaming CLUSTER-LABEL maintenance — the operational closure of
  * the streaming dedup tier. [[StreamDedup.againstIndex]] flags
  * duplicate PAIRS as documents arrive; downstream consumers
  * (apply/apply-best/cross-source — the d8/d13/d18 b-forms) need
  * LABELS. This keeps a committed (doc_id, cluster_id) parquet
  * artifact trailing the ingest stream by one trigger: per micro-batch,
  * screen the batch against the standing neardup index (cross pairs)
  * and against itself (batch-internal pairs), fold both into the
  * standing labels via [[Dedup.mergeIntoClusters]] — the contract-first
  * merge whose CC input is ingest-sized, never the corpus — and
  * publish.
  *
  * TWO PUBLISH MODES (the Hudi COW/MOR split, same trade as
  * [[graft.ext.Upsert]]'s):
  *  - `"replace"`: rewrite the full labels artifact per trigger and
  *    swap atomically through [[IndexStore.replace]]. Simple, plain-
  *    parquet readable — and O(total standing labels) I/O per trigger:
  *    at the 100 TB design point (~10⁹⁺ labels) every micro-batch pays
  *    a full labels-corpus copy regardless of batch size, so the
  *    steady-state cost is dominated by the artifact rewrite, not the
  *    dedup work (r15 verdict #1).
  *  - `"delta"` (the production mode at scale): the labels artifact is
  *    an [[graft.ext.Upsert]] merge-on-read table keyed by doc_id
  *    ([[initLabelsLog]]); per trigger only the CHANGED labels — the
  *    delta frame [[Dedup.mergeIntoClustersDelta]] computes, ingest-
  *    proportional — land as a committed `delta=<batchId>` dir. Write
  *    cost O(|changed|); the standing labels are scanned (the merge
  *    needs them) but never rewritten. Readers go through
  *    [[readLabels]] (base+delta latest-per-key view); the cadence
  *    rebuild the runbook already schedules folds the chain via
  *    [[compactLabels]], restoring scan-speed reads — and reader state
  *    is IDENTICAL before and after a compact (Upsert's spec-pinned
  *    fold contract).
  *
  * Delivery semantics — exactly-once twice over: the labels are a
  * pure function of (index pair graph ∪ every batch pair seen), and
  * merging an already-merged pair set is a connectivity no-op, so a
  * crash-replayed micro-batch converges to the identical artifact — no
  * batch-id bookkeeping is needed at all (contrast
  * [[StreamCodes]], whose appends are NOT idempotent and carry the
  * batch-rename commit). Delta mode adds the structural guarantee on
  * top: the micro-batch id IS the delta id, so a replay of a committed
  * batch is a literal write no-op (Upsert.appendChanges' idempotence
  * key) — it never even re-lands the rows. A replace-mode reader
  * during the swap window sees "no committed index" (loud-fail) rather
  * than a torn mix — the replace contract.
  *
  * Scope contract (same as the batch twin d14): pairs are found
  * batch-internally and batch-vs-INDEX. Two new documents arriving in
  * DIFFERENT micro-batches are not compared until the index's cadence
  * rebuild folds the streamed corpus in — the standing-index discipline
  * every incremental dedup pipeline runs on.
  *
  * Single-maintainer: one streaming query owns the labels artifact
  * (replace's documented contract); consumers are read-only.
  *
  * CADENCE-REBUILD RUNBOOK (the loop a production operator runs; every
  * stage spec-driven end to end by StreamClustersSpec's lifecycle
  * case): (1) run the maintainer under the current index generation;
  * (2) at the cadence point, STOP the query (a planned restart —
  * [[graft.streaming.StreamDedup.againstIndex]] and this maintainer
  * both capture the index at stream construction, so new index content
  * is only visible to a restarted query), fold the streamed survivors
  * into the index ([[Dedup.appendToNeardupIndex]]) and run the
  * periodic re-cap rewrite ([[Dedup.compactNeardupIndex]] — append
  * batches shift true bucket occupancy, the write-time cap's
  * documented caveat); in delta mode, also fold the retiring
  * generation's label chain first ([[compactLabels]] — scan-speed
  * reads for its remaining consumers); (3) bootstrap a GENERATION-2
  * labels artifact from the rebuilt index ([[initLabels]] /
  * [[initLabelsLog]] at a fresh path, matching the publish mode —
  * this is where every deferred cross-batch new-new pair enters the
  * labeling, because all streamed docs are now index-resident);
  * (4) resume the
  * maintainer from the SAME checkpoint pointed at the generation-2
  * labels — source offsets carry over, only new data is processed, and
  * new arrivals now pair against previously-streamed docs. Labels are
  * a pure function of the pair graph, so the generation swap needs no
  * data migration: consumers cut over by path, the old generation
  * stays readable until retired.
  */
object StreamClusters {

  /** Bootstrap the labels artifact from the standing index's own pair
    * graph (CC over its verified pairs) — build-if-absent, so calling
    * it on an already-maintained artifact is a no-op read. */
  def initLabels(spark: SparkSession, indexPath: String,
                 labelsPath: String, minJaccard: Double): String =
    IndexStore.ensure(spark, labelsPath) { scratch =>
      val index = Dedup.readNeardupIndex(spark, indexPath)
      val pairs = Dedup.verifyJaccardOnShingles(
          index.select(col("doc_id"), col("sh")),
          Dedup.candidatePairs(index), minJaccard)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(pairs).write.mode("overwrite").parquet(scratch)
    }

  /** Ordering column of the delta-mode labels log: monotone with the
    * delta id (batchId + 1; the bootstrap base is 0), persisted in the
    * rows so the latest-wins order SURVIVES compaction — Upsert's
    * merged view ranks base < delta by directory, but a folded winner
    * must still outrank nothing newer than itself after its delta dir
    * is gone. */
  private val VerCol = "ver"

  /** Bootstrap the DELTA-MODE labels artifact ([[labelMaintainer]]'s
    * `publish = "delta"`): the same index-pair-graph CC as
    * [[initLabels]], landed as an [[Upsert]] merge-on-read table keyed
    * by doc_id. Build-if-absent: an existing labels log is left
    * standing. `nBuckets` sizes the COW rewrite unit for the cadence
    * fold (the BASELINE operating rule is ≳1 GB/bucket at the target
    * corpus; the sandbox default is small). */
  def initLabelsLog(spark: SparkSession, indexPath: String,
                    labelsPath: String, minJaccard: Double,
                    nBuckets: Int = 16): String = {
    if (!Upsert.isTable(spark, labelsPath)) {
      val index = Dedup.readNeardupIndex(spark, indexPath)
      val pairs = Dedup.verifyJaccardOnShingles(
          index.select(col("doc_id"), col("sh")),
          Dedup.candidatePairs(index), minJaccard)
        .select(col("a_id"), col("b_id"))
      Upsert.init(
        Dedup.connectedComponents(pairs).withColumn(VerCol, lit(0L)),
        labelsPath, "doc_id", Seq(VerCol), nBuckets)
    }
    labelsPath
  }

  /** The labels as of now, whichever publish mode maintains them:
    * delta mode's base+delta latest-per-key view, or the plain
    * committed parquet artifact of replace mode — always exactly
    * (doc_id, cluster_id). The ONE read consumers (apply/apply-best/
    * cross-source) should call, so switching publish modes never
    * touches them. */
  def readLabels(spark: SparkSession, labelsPath: String): DataFrame =
    if (Upsert.isTable(spark, labelsPath))
      Upsert.readTable(spark, labelsPath).select(col("doc_id"), col("cluster_id"))
    else IndexStore.read(spark, labelsPath,
      "cluster labels", "StreamClusters.initLabels")

  /** Fold the accumulated label deltas into the base — the labels half
    * of the cadence rebuild (run it at the same planned stop where the
    * index is folded and re-capped; see the runbook above). Returns the
    * number of deltas folded. No-op (0) in replace mode or on an empty
    * chain. */
  def compactLabels(spark: SparkSession, labelsPath: String): Int =
    if (Upsert.isTable(spark, labelsPath)) Upsert.compactDeltas(spark, labelsPath)
    else 0

  /** The `foreachBatch` function: attach with
    * `.writeStream.foreachBatch(StreamClusters.labelMaintainer(idx, labels, 0.8))`.
    * `labelsPath` must hold a committed labels artifact
    * ([[initLabels]]).
    *
    * ARMING DIALS (r14 verdict #2), mirroring the batch merge's two
    * modes exactly — the r14 zipf-decade measurement proved the
    * unguarded screen class DNFs (66 GB spill) on boilerplate-heavy
    * corpora, and a boilerplate-heavy micro-batch replay hits the same
    * screens here:
    *  - `maxBucket` > 0 with `skewMode = "drop"`: both batch screens
    *    under the d14b_merge_capped drop discipline — the internal
    *    screen caps BATCH band buckets ([[Dedup.candidatePairs]]'s
    *    cap), the cross screen caps the INDEX's posting lists
    *    ([[Dedup.incrementalNeardup]]'s "drop" arm). Changes the pair
    *    set by the capped twin's documented recall contract.
    *  - `maxBucket` > 0 with `skewMode = "salt"`: the recall-PRESERVING
    *    split on both screens (d14b_merge_salted's) — output equals
    *    the unguarded maintainer exactly, per-task join input bounded.
    * Default 0 = the unguarded exact form (oracle parity with
    * d14b_merge_pre). Per-batch semantics are spec-pinned equal to the
    * corresponding batch merge registration in StreamClustersSpec.
    * A standing index written with [[Dedup.writeNeardupIndex]]'s
    * write-time cap already bounds the CROSS screen with the guard off
    * (hot posting lists are NULL in the stored rows — the documented
    * streaming default); these dials add the same discipline to the
    * BATCH-INTERNAL screen, which no index write can pre-cap.
    *
    * PUBLISH (see the class doc): `"replace"` rewrites the whole
    * artifact per trigger (labelsPath from [[initLabels]]);
    * `"delta"` appends only the changed labels to the Upsert log
    * (labelsPath from [[initLabelsLog]]) — the mode whose per-trigger
    * I/O is proportional to the batch, not the corpus. The two modes
    * are spec-pinned to identical [[readLabels]] state per trigger. */
  def labelMaintainer(indexPath: String, labelsPath: String,
                      minJaccard: Double, maxBucket: Int = 0,
                      skewMode: String = "drop",
                      publish: String = "replace"): (DataFrame, Long) => Unit =
    (df, batchId) => {
      require(publish == "replace" || publish == "delta",
        s"publish must be replace or delta, got $publish")
      val spark = df.sparkSession
      if (!df.isEmpty) {
        val batch = graft.core.CacheScope.track(df.persist())
        // ONE batch shingle + signature projection feeds BOTH screens
        // (r16: the cross screen used to re-shingle the batch inside
        // incrementalNeardup — a whole tokenize→shingle→md5 pass per
        // trigger, twice). bSigs is persisted because three join sides
        // read it: the cross screen's band fan-out and both sides of
        // the internal candidate self-join.
        val bsh = graft.core.CacheScope.track(
          Dedup.shingleFrame(batch).persist())
        val bSigs = graft.core.CacheScope.track(
          Dedup.signaturesFromShingles(bsh).persist())
        // cross pairs: the batch screened against the standing index
        // (d9's operational screen — index bands for candidates, stored
        // shingles for the exact verify; the corpus text never re-read)
        val cross = Dedup.incrementalNeardupOnShingles(spark, bsh, bSigs,
            indexPath, minJaccard, maxBucket = maxBucket, skewMode = skewMode)
          .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
        // batch-internal pairs: new docs duplicating each other within
        // this trigger
        val internalCand =
          if (skewMode == "salt" && maxBucket > 0)
            Dedup.candidatePairsSalted(bSigs, maxBucket = maxBucket)
          else Dedup.candidatePairs(bSigs, maxBucket = maxBucket)
        val internal = Dedup.verifyJaccardOnShingles(bsh, internalCand, minJaccard)
          .select(col("a_id"), col("b_id"))
        val pairs = internal.union(cross)
        if (publish == "delta") {
          // persisted: unlike replace mode's plain parquet scan, the
          // MOR labels are a latest-per-key AGGREGATION over
          // base+deltas, and the merge reads them four times (two
          // contraction joins, the changed-rows join, the new-rows
          // anti-join) — unpersisted, every read would re-run the
          // whole merged-view shuffle+agg
          val labels = readLabels(spark, labelsPath).persist()
          // persisted: the frame feeds two actions (the emptiness probe
          // and the append) and its remap joins would otherwise re-scan
          // the standing labels in between
          val changes = Dedup.mergeIntoClustersDelta(labels, pairs)
            .withColumn(VerCol, lit(batchId + 1L))
            .withColumn("op", lit("U"))
            .persist()
          // an all-known replay (same docs under a NEW batch id — the
          // one replay shape the delta-id key can't catch) merges to an
          // empty delta: skip the append entirely rather than commit an
          // empty dir per no-op trigger. Convergence is unaffected —
          // the labels are a pure function of the pair graph.
          try {
            if (!changes.isEmpty)
              Upsert.appendChanges(spark, labelsPath, changes,
                deltaId = Some(batchId))
          } finally {
            changes.unpersist(false)
            labels.unpersist(false)
          }
        } else {
          val labels = IndexStore.read(spark, labelsPath,
            "cluster labels", "StreamClusters.initLabels")
          val merged = Dedup.mergeIntoClusters(labels, pairs)
          // the build reads the OLD committed labels and writes scratch in
          // full before replace swaps — readers never see a torn artifact
          IndexStore.replace(spark, labelsPath) { scratch =>
            merged.write.mode("overwrite").parquet(scratch)
          }
        }
        bSigs.unpersist()
        bsh.unpersist()
        batch.unpersist()
      }
      ()
    }
}
