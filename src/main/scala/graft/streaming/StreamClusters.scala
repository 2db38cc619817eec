package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup
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
  * republish atomically through [[IndexStore.replace]].
  *
  * Delivery semantics — exactly-once BY IDEMPOTENCE: the labels are a
  * pure function of (index pair graph ∪ every batch pair seen), and
  * merging an already-merged pair set is a connectivity no-op, so a
  * crash-replayed micro-batch converges to the identical artifact — no
  * batch-id bookkeeping is needed at all (contrast
  * [[StreamCodes]], whose appends are NOT idempotent and carry the
  * batch-rename commit). A reader during the replace swap window sees
  * "no committed index" (loud-fail) rather than a torn mix — the
  * replace contract.
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
  * documented caveat); (3) bootstrap a GENERATION-2 labels artifact
  * from the rebuilt index ([[initLabels]] at a fresh path — this is
  * where every deferred cross-batch new-new pair enters the labeling,
  * because all streamed docs are now index-resident); (4) resume the
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
    * BATCH-INTERNAL screen, which no index write can pre-cap. */
  def labelMaintainer(indexPath: String, labelsPath: String,
                      minJaccard: Double, maxBucket: Int = 0,
                      skewMode: String = "drop"): (DataFrame, Long) => Unit =
    (df, _) => {
      val spark = df.sparkSession
      if (!df.isEmpty) {
        val batch = graft.core.CacheScope.track(df.persist())
        // cross pairs: the batch screened against the standing index
        // (d9's operational screen — index bands for candidates, stored
        // shingles for the exact verify; the corpus text never re-read)
        val cross = Dedup.incrementalNeardup(spark, batch, indexPath,
            minJaccard, maxBucket = maxBucket, skewMode = skewMode)
          .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
        // batch-internal pairs: new docs duplicating each other within
        // this trigger
        val bsh = graft.core.CacheScope.track(
          Dedup.shingleFrame(batch).persist())
        val bSigs = Dedup.signaturesFromShingles(bsh)
        val internalCand =
          if (skewMode == "salt" && maxBucket > 0)
            Dedup.candidatePairsSalted(bSigs, maxBucket = maxBucket)
          else Dedup.candidatePairs(bSigs, maxBucket = maxBucket)
        val internal = Dedup.verifyJaccardOnShingles(bsh, internalCand, minJaccard)
          .select(col("a_id"), col("b_id"))
        val labels = IndexStore.read(spark, labelsPath,
          "cluster labels", "StreamClusters.initLabels")
        val merged = Dedup.mergeIntoClusters(labels, internal.union(cross))
        // the build reads the OLD committed labels and writes scratch in
        // full before replace swaps — readers never see a torn artifact
        IndexStore.replace(spark, labelsPath) { scratch =>
          merged.write.mode("overwrite").parquet(scratch)
        }
        bsh.unpersist()
        batch.unpersist()
      }
      ()
    }
}
