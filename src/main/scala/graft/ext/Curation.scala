package graft.ext

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Knobs for the end-to-end batch curation pipeline ([[Curation]]).
  *
  * Defaults reproduce the oracle-checked `x_curate_pack` registration
  * exactly (spec-asserted in `CurationSpec`): unguarded LSH, Jaccard
  * 0.8, min-id canonical survivors, token gate [20, 2000], 8 shards at
  * a 4096-token packing budget.
  *
  * @param minJaccard     near-dup verify threshold (exact Jaccard over
  *                       distinct 3-shingle sets)
  * @param maxBucket      LSH band-bucket occupancy bound; 0 = unguarded
  *                       (every oracle default). With `skewMode="drop"`
  *                       this arms [[SkewGuard.capBuckets]] (df-cap:
  *                       drops degenerate boilerplate buckets, recall
  *                       contract documented there); with `"salt"` it
  *                       arms [[SkewGuard.saltedSelfJoinPairs]]
  *                       (recall-preserving salt-split — output equals
  *                       the unguarded pipeline, per-task input bounded)
  * @param skewMode       "drop" | "salt" — see `maxBucket`
  * @param representative "canonical" keeps each cluster's min-id member
  *                       (d8 semantics); "best" keeps the quality-argmax
  *                       member (d13 semantics — what production ships)
  * @param minTokens      inclusive whitespace-token quality gate bounds
  * @param maxTokens      (docs outside the band are dropped post-dedup)
  * @param nShards        packing shards (`doc_id mod nShards`)
  * @param packBudget     tokens per packed training sequence
  * @param hashMode       "md5" (oracle-priced) | "xxh64" (production
  *                       twin — codegen-native 64-bit sigs/bands; see
  *                       [[Dedup.signaturesFromShingles]])
  */
final case class CurationConfig(
    minJaccard: Double = 0.8,
    maxBucket: Int = 0,
    skewMode: String = "drop",
    representative: String = "canonical",
    minTokens: Long = 20L,
    maxTokens: Long = 2000L,
    nShards: Int = 8,
    packBudget: Long = 4096L,
    hashMode: String = "md5") {
  require(minJaccard >= 0.0 && minJaccard <= 1.0,
    s"minJaccard must be in [0,1], got $minJaccard")
  require(skewMode == "drop" || skewMode == "salt",
    s"skewMode must be drop or salt, got $skewMode")
  require(skewMode == "drop" || maxBucket > 0,
    "skewMode=salt needs maxBucket > 0 (the sub-bucket size bound)")
  require(representative == "canonical" || representative == "best",
    s"representative must be canonical or best, got $representative")
  require(minTokens <= maxTokens,
    s"minTokens ($minTokens) must be <= maxTokens ($maxTokens)")
  require(nShards > 0, s"nShards must be positive, got $nShards")
  require(packBudget > 0, s"packBudget must be positive, got $packBudget")
}

/** The batch curation pipeline as ONE composable entry point — what a
  * corpus team calls instead of hand-chaining the d2→d3→d7→d8/d13→gate→
  * pack query functions (whose primary shape is the per-stage gate
  * registration): shingle once, LSH candidates (optionally skew-guarded),
  * exact-Jaccard verify, connected-components clustering, survivor
  * selection, token-band quality gate, fixed-budget sequence packing.
  *
  * Stage helpers live here as the single owner ([[applyCanonical]],
  * [[clusterBest]], [[applyBest]], [[packIntoSequences]]); the query
  * registry's `*On` forms delegate to them, so the oracle-checked
  * registrations and this API are definitionally the same code. The
  * streaming twin is [[graft.streaming.StreamCuration]]; the
  * incremental path (screen a new batch against a committed index, fold
  * its pairs into standing labels) is [[Dedup.incrementalNeardup]] +
  * [[Dedup.mergeIntoClusters]] over a [[graft.core.IndexStore]].
  *
  * 100 TB shape: every stage is the same plan the per-stage
  * registrations ship (shingle frame persisted and shared by signature
  * and verify sides, posting-list-bounded candidates, pair-graph-sized
  * CC with per-round lineage truncation, AQE-adaptive survivor joins,
  * one window for the per-shard pack). A production run persists or
  * checkpoints [[clusters]]' output and feeds it to [[curateWith]] so
  * CC is paid once per corpus, not once per consumer.
  */
object Curation {

  private def candidateStage(sigs: DataFrame, cfg: CurationConfig): DataFrame =
    cfg.skewMode match {
      case "salt" => Dedup.candidatePairsSalted(sigs, maxBucket = cfg.maxBucket)
      case _      => Dedup.candidatePairs(sigs, maxBucket = cfg.maxBucket)
    }

  /** Verified near-dup pairs (a_id, b_id, n_common, n_a, n_b, jaccard) —
    * d3's pipeline under `cfg`'s candidate-stage knobs. */
  def neardupPairs(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    val sh = graft.core.CacheScope.track(Dedup.shingleFrame(docs).persist())
    val sigs = graft.core.CacheScope.track(
      Dedup.signaturesFromShingles(sh, hashMode = cfg.hashMode).persist())
    Dedup.verifyJaccardOnShingles(sh, candidateStage(sigs, cfg), cfg.minJaccard)
  }

  /** (doc_id, cluster_id) labels for every doc in a near-dup cluster —
    * d7's pipeline under `cfg`. Persist (or checkpoint) the result when
    * more than one consumer reads it; it is backed by a persisted RDD
    * either way (see [[Dedup.connectedComponents]]). */
  def clusters(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    val sh = Dedup.shingleFrame(docs).persist()
    // both candidate-join sides read the signature frame — persisted
    // like [[neardupPairs]]' (r16 plan audit: unpersisted, the
    // md5+array_min signature projection re-ran once per join side)
    val sigs = Dedup.signaturesFromShingles(sh, hashMode = cfg.hashMode).persist()
    try {
      val pairs = Dedup.verifyJaccardOnShingles(sh, candidateStage(sigs, cfg),
          cfg.minJaccard)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(pairs)
    } finally {
      // CC materialized every read of the pair graph before returning,
      // so both frames are released eagerly — including on throw
      sigs.unpersist()
      sh.unpersist()
    }
  }

  /** Survivors under the min-id CANONICAL rule (d8 semantics): each
    * cluster keeps its cluster_id member, unclustered docs pass through,
    * every survivor tagged with the member count it now represents.
    * Scale shape: the label frame is pair-graph-sized — AQE converts
    * the anti-join and size lookup to broadcasts at runtime; when dups
    * are corpus-proportional the same plan degrades to shuffled
    * equi-joins (the broadcast is deliberately not hinted). */
  def applyCanonical(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_merged"))
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    docs.select(col("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
      .join(sizes, col("doc_id") === col("cluster_id"), "left")
      .select(col("doc_id"), coalesce(col("n_merged"), lit(1L)).as("n_merged"))
  }

  /** Per-cluster quality-argmax representative (d10 semantics): quality
    * is projected ONLY for cluster members (corpus scan is probe side of
    * a pair-graph-sized build), argmax is a single `max_by` hash agg —
    * no sort window; ties break to the smaller doc_id, deterministic at
    * any partitioning. */
  def clusterBest(docs: DataFrame, clusters: DataFrame): DataFrame = {
    import graft.ext.{TextAnalysis => TA}
    val toks = split(col("text"), "\\s+")
    val members = docs.join(clusters, Seq("doc_id"))
      // token array staged once — same rationale as textStats
      .select(col("doc_id"), col("cluster_id"), col("text"), toks.as("__toks"))
      .select(col("doc_id"), col("cluster_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TA.stopwordRatio(col("__toks")).as("stopword_ratio"),
        TA.punctRatio(col("text")).as("punct_ratio"))
      .select(col("doc_id"), col("cluster_id"),
        TA.qualityFromStaged(col("n_tokens"), col("stopword_ratio"),
          col("punct_ratio")).as("quality"))
    members.groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"),
          struct(col("quality").as("q"), (-col("doc_id")).as("nid"))).as("best_id"),
        max(col("quality")).as("best_quality"),
        count(lit(1)).as("n_members"))
  }

  /** Survivors under the quality-argmax BEST rule (d13 semantics): same
    * survivor/accounting contract as [[applyCanonical]] (unclustered
    * docs pass through with n_merged = 1; n_merged sums to the corpus),
    * only the kept representative changes. */
  def applyBest(docs: DataFrame, clusters: DataFrame): DataFrame = {
    // `best` feeds TWO join branches (losers anti-join, n_merged
    // lookup); persist it so the members/quality projection inside
    // clusterBest can't execute twice if AQE replans the branches
    // differently — it's pair-graph-sized
    val best = graft.core.CacheScope.track(
      clusterBest(docs, clusters)
        .select(col("cluster_id"), col("best_id"), col("n_members"))
        .persist())
    val losers = clusters.join(best, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("best_id"))
      .select(col("doc_id"))
    docs.select(col("doc_id"))
      .join(losers, Seq("doc_id"), "left_anti")
      .join(best.select(col("best_id").as("doc_id"),
        col("n_members").as("n_merged")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_merged"), lit(1L)).as("n_merged"))
  }

  /** Cross-source representative rule: each near-dup cluster keeps the
    * member from the highest-priority SOURCE (ties inside a source by
    * min doc_id) — the policy a multi-crawl pipeline applies when the
    * same page arrives from several dumps/registries and one is
    * authoritative ("prefer wiki over CC"). `priority` is a
    * (source, prio) frame, lower prio wins; it is registry-sized, so it
    * broadcasts — the only corpus-sized work is the members join and
    * one per-cluster hash agg (min_by, no sort window). Unknown sources
    * (no priority row) are dropped from the vote by the inner join —
    * pass a complete registry or union a default tier first. */
  def clusterBySource(docs: DataFrame, clusters: DataFrame,
                      priority: DataFrame): DataFrame = {
    val members = docs.select(col("doc_id"), col("source"))
      .join(clusters, Seq("doc_id"))
      .join(broadcast(priority), Seq("source"))
    members.groupBy(col("cluster_id"))
      .agg(
        min_by(col("doc_id"), struct(col("prio"), col("doc_id"))).as("keep_id"),
        min_by(col("source"), struct(col("prio"), col("doc_id"))).as("keep_source"),
        min(col("prio")).as("keep_prio"),
        count(lit(1)).as("n_members"))
  }

  /** Fixed-budget sequence packing: shard by doc_id, per-shard running
    * token sum, window id = start offset div budget. Requires an
    * `n_tok` column. Scale note: the window sort is per-shard; nShards
    * sizes the parallelism — a 100 TB run sets it to O(cluster cores),
    * keeping each shard's sort an executor-local spillable sort. */
  def packIntoSequences(df: DataFrame, nShards: Int = 8,
                        budget: Long = 4096L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    df.withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
      .drop("cum")
  }

  /** The full pipeline against a PRE-COMPUTED (doc_id, cluster_id)
    * frame — the production form: run [[clusters]] (or the incremental
    * merge) once, persist it, and feed every consumer. Output:
    * (doc_id, shard, n_tok, n_merged, seq_id). */
  def curateWith(docs: DataFrame, clusters: DataFrame,
                 cfg: CurationConfig = CurationConfig()): DataFrame = {
    import graft.ext.{TextAnalysis => TA}
    val survivors = cfg.representative match {
      case "best" => applyBest(docs, clusters)
      case _      => applyCanonical(docs, clusters)
    }
    val toks = docs.select(col("doc_id"), TA.tokenCount(col("text")).as("n_tok"))
    val kept = survivors.join(toks, "doc_id")
      .filter(col("n_tok").between(cfg.minTokens, cfg.maxTokens))
    packIntoSequences(kept, cfg.nShards, cfg.packBudget)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("n_merged"),
        col("seq_id"))
  }

  /** One-call curation: cluster + survive + gate + pack under `cfg`.
    * Equal to the `x_curate_pack` registration at the default config
    * (spec-asserted and oracle-checked). */
  def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame =
    curateWith(docs, clusters(docs, cfg), cfg)

  /** [[curateWith]] with FREE pipeline counters: three `observe`
    * points (CollectMetrics nodes) whose aggregates are computed by
    * the pass that was running anyway — where an ops dashboard would
    * otherwise pay three recount jobs over a 100 TB input, these cost
    * zero extra scans and no extra shuffle (observe aggregates merge
    * map-side like any partial agg).
    *
    *  - `curate_in`:    docs, tokens — the corpus entering the gate
    *  - `curate_dedup`: survivors, docs_represented — post-dedup
    *    (drop = docs - survivors; represented counts absorbed dups)
    *  - `curate_out`:   kept, tokens_kept — post quality gate, what
    *    packing actually ships
    *
    * Read each [[org.apache.spark.sql.Observation]] AFTER one action
    * on the returned frame (`Observation.get` blocks until then). The
    * observe points sit on single-use plan branches — the `docs` scan
    * itself is consumed twice (survivor join + token projection), so
    * the input counter rides the token branch, which sees every doc
    * exactly once. Streaming pipelines surface the same counters per
    * micro-batch through `StreamingQueryProgress.observedMetrics`. */
  def curateWithMetrics(docs: DataFrame, clusters: DataFrame,
                        cfg: CurationConfig = CurationConfig())
      : (DataFrame, Observation, Observation, Observation) = {
    import graft.ext.{TextAnalysis => TA}
    val oIn = Observation()
    val oDedup = Observation()
    val oOut = Observation()
    val survivors = cfg.representative match {
      case "best" => applyBest(docs, clusters)
      case _      => applyCanonical(docs, clusters)
    }
    val toks = docs.select(col("doc_id"), TA.tokenCount(col("text")).as("n_tok"))
      .observe(oIn, count(lit(1)).as("docs"), sum(col("n_tok")).as("tokens"))
    val kept = survivors.join(toks, "doc_id")
      .observe(oDedup, count(lit(1)).as("survivors"),
        sum(col("n_merged")).as("docs_represented"))
      .filter(col("n_tok").between(cfg.minTokens, cfg.maxTokens))
      .observe(oOut, count(lit(1)).as("kept"),
        sum(col("n_tok")).as("tokens_kept"))
    val packed = packIntoSequences(kept, cfg.nShards, cfg.packBudget)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("n_merged"),
        col("seq_id"))
    (packed, oIn, oDedup, oOut)
  }

  /** The INCREMENTAL operational loop in one call — what an ingest
    * pipeline runs per batch instead of re-curating the corpus:
    * screen the new batch against the committed near-dup index
    * (batch-internal pairs + batch-vs-corpus pairs; the corpus text is
    * never re-tokenized — bands and stored shingle arrays come from the
    * index parquet), fold the verified pairs into the STANDING labels
    * via [[Dedup.mergeIntoClusters]] (CC input is |labels| + |pairs|
    * edges, never corpus pair counts), then curate the combined corpus
    * against the updated labels.
    *
    * Output equals from-scratch [[curate]] over
    * `corpusDocs union batch` (spec-asserted; the label equality is the
    * d14 registration's oracle-checked star-forest argument) — the
    * difference is COST: per-ingest work tracks the batch and the
    * affected components. After the batch ships, fold its survivors
    * into the index with [[Dedup.appendToNeardupIndex]] and persist the
    * returned labels as tomorrow's `corpusLabels`.
    *
    * Skew dials: `cfg.skewMode = "drop"` df-caps both the batch's
    * self-join and the index side of the cross screen; `"salt"` is
    * recall-preserving on BOTH joins — the triangular salt-split for
    * the batch-internal self-join ([[SkewGuard.saltedSelfJoinPairs]])
    * and the 2-D grid split for the batch×index cross screen
    * ([[SkewGuard.saltedCrossJoinPairs]]), so the armed loop's pair set
    * equals the unguarded loop's exactly. A write-time-capped index
    * ([[Dedup.writeNeardupIndex]]'s `maxBucket`) remains the zero-cost
    * production alternative when hot index buckets are degenerate
    * boilerplate rather than real standing clusters. `hashMode`
    * must be md5: the index stores md5-mode bands. */
  def curateIncremental(corpusDocs: DataFrame, corpusLabels: DataFrame,
                        batch: DataFrame, indexPath: String,
                        cfg: CurationConfig = CurationConfig()): DataFrame = {
    // loud fail at the API edge: the unionByName below would otherwise
    // surface a mismatched batch (extra/missing columns) as an analysis
    // error deep inside the composed plan
    val (c, b) = (corpusDocs.columns.sorted.toSeq, batch.columns.sorted.toSeq)
    require(c == b,
      s"curateIncremental needs batch and corpus schemas to match — " +
        s"corpus has ${c.mkString("(", ", ", ")")}, " +
        s"batch has ${b.mkString("(", ", ", ")")}")
    curateWith(corpusDocs.unionByName(batch),
      incrementalLabels(corpusLabels, batch, indexPath, cfg), cfg)
  }

  /** The LABEL-MAINTENANCE step of [[curateIncremental]] on its own —
    * screen `batch` against the committed index and fold the verified
    * pairs into `corpusLabels`. This is the part whose cost tracks the
    * BATCH (the from-scratch alternative, [[clusters]] over the
    * combined corpus, re-pays shingling + candidates + verify + CC for
    * every doc ever ingested); `tools/ProfileIncremental` measures the
    * two side by side. Returned labels cover every doc in a cluster —
    * persist them as the next ingest's `corpusLabels`. */
  def incrementalLabels(corpusLabels: DataFrame, batch: DataFrame,
                        indexPath: String,
                        cfg: CurationConfig = CurationConfig()): DataFrame = {
    require(cfg.hashMode == "md5",
      "curateIncremental screens against a writeNeardupIndex artifact, " +
        "which stores md5-mode bands")
    val spark = batch.sparkSession
    val index = Dedup.readNeardupIndex(spark, indexPath)
    // the batch shingle/signature frames feed the self-join, the cross
    // screen, and both verify stages — persist once (batch-sized)
    val bsh = graft.core.CacheScope.track(Dedup.shingleFrame(batch).persist())
    val bSigs = graft.core.CacheScope.track(
      Dedup.signaturesFromShingles(bsh).persist())
    val batchPairs = Dedup.verifyJaccardOnShingles(bsh,
        candidateStage(bSigs, cfg), cfg.minJaccard)
      .select(col("a_id"), col("b_id"))
    val bBands = bSigs.select(col("doc_id").as("batch_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx", "band_hash")))
    val cand =
      if (cfg.skewMode == "salt" && cfg.maxBucket > 0)
        SkewGuard.saltedCrossJoinPairs(
          bBands,
          index.select(col("doc_id").as("corpus_id"),
            posexplode(array(col("band0"), col("band1")))
              .as(Seq("band_idx", "band_hash"))),
          Seq("band_idx", "band_hash"), "batch_id", "corpus_id",
          cfg.maxBucket)
      else {
        val iBands = SkewGuard.capBuckets(
          index.select(col("doc_id").as("corpus_id"),
            posexplode(array(col("band0"), col("band1")))
              .as(Seq("band_idx_b", "band_hash_b"))),
          Seq("band_idx_b", "band_hash_b"), cfg.maxBucket)
        bBands.join(iBands,
            col("band_idx") === col("band_idx_b") &&
            col("band_hash") === col("band_hash_b"))
          .select(col("batch_id"), col("corpus_id")).distinct()
      }
    val crossPairs = Dedup.verifyJaccardAcross(bsh,
        index.select(col("doc_id"), col("sh")), cand, cfg.minJaccard,
        "batch_id", "corpus_id")
      .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
    Dedup.mergeIntoClusters(corpusLabels, batchPairs.union(crossPairs))
  }
}
