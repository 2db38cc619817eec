package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ext.Dedup

/** Deduplication suite over `documents` (builder prompt: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard). Every stage is oracle-checked
  * against DuckDB computing the same md5-derived hashes.
  */
object DedupQueries extends QueryGroup {

  /** Exact dedup: hash-group by content digest, flag non-canonical
    * copies. One shuffle on the digest. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("text_md5"))
    Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("boolean"))
    // full-output queries: no presentation sort (order-insensitive gate)
  }

  /** MinHash signatures + LSH band hashes — pure projection, no shuffle.
    * `hashMode` "xxh64" is the production twin (codegen-native 64-bit
    * sigs/bands, no hex strings in the shuffle; no DuckDB counterpart —
    * benched, not oracle-checked). */
  def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    minhashSigs(spark, dir, "md5")
  def minhashSigs(spark: SparkSession, dir: String, hashMode: String): DataFrame =
    Dedup.minhashSignatures(Tables(spark, dir).documents, hashMode = hashMode)

  /** Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard
    * verify at 0.8. */
  def neardupPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // Shingle ONCE, persist, and feed both the signature stage and the
    // Jaccard verification (each reads the frame from two join sides) —
    // the shingling + per-shingle md5 projection is the pipeline's
    // dominant cost and used to run twice. The 100 TB design checkpoints
    // the same frame.
    val sh = graft.core.CacheScope.track(Dedup.shingleFrame(docs).persist())
    val sigs = graft.core.CacheScope.track(Dedup.signaturesFromShingles(sh).persist())
    val cand = Dedup.candidatePairs(sigs)
    Dedup.verifyJaccardOnShingles(sh, cand, 0.8)
  }

  /** d3's pipeline with the [[graft.ext.SkewGuard]] ARMED (maxBucket =
    * 2): band buckets above the cap are dropped before the candidate
    * join, and the DuckDB oracle mirrors the cap in SQL — so the
    * guard's output contract (a pair survives iff it collides in a
    * sub-cap bucket) is hash-checked cross-engine, not just
    * spec-asserted. The cap is deliberately LOW so the clean synthetic
    * corpus actually exercises the drop path (at sf0.01 it drops a
    * 3-doc cluster's bucket: 25 → 22 pairs); a production cap sits
    * orders of magnitude above expected duplicate-cluster size and
    * drops only degenerate boilerplate buckets. */
  def neardupPairsCapped(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val sh = graft.core.CacheScope.track(Dedup.shingleFrame(docs).persist())
    val sigs = graft.core.CacheScope.track(Dedup.signaturesFromShingles(sh).persist())
    Dedup.verifyJaccardOnShingles(sh, Dedup.candidatePairs(sigs, maxBucket = 2), 0.8)
  }

  /** d3's pipeline with the recall-PRESERVING skew treatment
    * ([[graft.ext.Dedup.candidatePairsSalted]]): hot band buckets are
    * salt-split into bounded sub-buckets (cross-product joined) instead
    * of dropped, so the output is EXACTLY unguarded d3 — this
    * registration shares d3's oracle VERBATIM, making the
    * recall-preservation claim hash-checked cross-engine rather than
    * only spec-asserted. maxBucket = 2 forces real splitting on the
    * synthetic corpus (3-doc cluster buckets get g = 2 sub-buckets);
    * production sizes the cap to executor-task comfort (thousands). */
  def neardupPairsSalted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val sh = graft.core.CacheScope.track(Dedup.shingleFrame(docs).persist())
    val sigs = graft.core.CacheScope.track(Dedup.signaturesFromShingles(sh).persist())
    Dedup.verifyJaccardOnShingles(sh,
      Dedup.candidatePairsSalted(sigs, maxBucket = 2), 0.8)
  }

  /** Winnowed-fingerprint shared-span report (Schleimer et al.
    * SIGMOD'03; the candidate generator for Lee-et-al-style exact
    * substring dedup — scaladoc on [[Dedup.winnowSharedSpans]]). k = 4
    * token grams, window w = 4: any two docs sharing an exact 7-token
    * run share a selected fingerprint; pairs sharing >= 2 are
    * reported with their earliest positions. Unguarded (maxBucket = 0)
    * so the DuckDB oracle mirrors the full join; production arms the
    * fingerprint-hash df-cap exactly like the band join. */
  def winnowSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowSharedSpans(Tables(spark, dir).documents, k = 4, w = 4,
      minShared = 2L)

  /** d15 with the fingerprint df-cap ARMED (maxBucket = 2) and the cap
    * mirrored in the oracle as a HAVING on the posting lists — the
    * d3_neardup_capped precedent: the guard's output contract (a pair
    * survives iff it shares >= minShared SUB-CAP fingerprints) is
    * hash-checked cross-engine. The cap is deliberately LOW so the
    * clean synthetic corpus exercises the drop path; production sizes
    * it to task comfort and it drops only boilerplate k-grams
    * (license headers, nav chrome), whose spans are exactly the ones
    * exact-substring dedup does NOT want to act on. */
  def winnowSpansCapped(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowSharedSpans(Tables(spark, dir).documents, k = 4, w = 4,
      minShared = 2L, maxBucket = 2)

  /** Verified shared-span EXTENTS (scaladoc on
    * [[Dedup.winnowSpanExtents]]): where each duplicated run sits in
    * both docs, slice-verified so every row is a literal identical
    * token run. minLen = k + w - 1 = 7, the winnowing detection
    * guarantee threshold. */
  def winnowExtents(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowSpanExtents(Tables(spark, dir).documents, k = 4, w = 4,
      minLen = 7L)

  /** LSH recall/precision audit ([[Dedup.lshRecallAudit]]) over the
    * doc_id % 2 audit slice — the slice keeps the complete-truth
    * overlap join (Σ df² — the quadratic LSH exists to avoid) bounded
    * regardless of parent corpus size, the same operating-mode
    * precedent as d12_containment_slice. One summary row whose recall/
    * precision numbers are themselves hash-checked cross-engine: the
    * audit that certifies the d3 pipeline is certified too. */
  def lshRecallAudit(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallAudit(
      Tables(spark, dir).documents.filter(col("doc_id") % 2 === 0), 0.8)

  /** 48-bit SimHash per document (Dedup.simhashBits). `hashMode` as in
    * [[minhashSigs]]. */
  def simhashes(spark: SparkSession, dir: String): DataFrame =
    simhashes(spark, dir, "md5")
  def simhashes(spark: SparkSession, dir: String, hashMode: String): DataFrame = {
    // bare explode is safe here: the generator input is a complex
    // expression, and InferFiltersFromGenerate only plants its implicit
    // size>0 filter for Attribute inputs (probe-verified on 4.1.2) —
    // the staged-column form would need explode_outer (see sourceOverlap)
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
    Dedup.simhash(toks, hashMode = hashMode)
  }

  /** SimHash near-dup candidates: pairs at Hamming distance <= maxHamming,
    * via band rotation (Dedup.simhashBandPairs): maxHamming+1 = 3 bands
    * of simhashBits/3 = 16 bits each, so any pair within distance 2
    * collides on at least one band (pigeonhole). Candidates come from an
    * equi-join on (band_idx, band_bits), never an all-pairs scan, so the
    * plan scales like the LSH path (d3). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(spark, dir, "md5")
  def simhashPairs(spark: SparkSession, dir: String, hashMode: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t")) // see simhashes
    val s = graft.core.CacheScope.track( // both band-join sides read it
      Dedup.simhash(toks, hashMode = hashMode).persist())
    Dedup.simhashBandPairs(s, maxHamming = 2)
  }

  /** Character 5-gram Jaccard over sampled adjacent doc pairs — the
    * direct n-gram-Jaccard method (d3 is its LSH-accelerated scale
    * path). Shingling is a staged projection; comparison is per-pair
    * array intersection. The sample predicate is applied BEFORE
    * shingling on each side (side a needs doc_id % 10 == 0, side b its
    * successors, % 10 == 1), so only 20% of the corpus is ever
    * shingled — the shingling lambda is the query's dominant cost. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    def grams(side: DataFrame): DataFrame = side
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .select(col("doc_id"),
        when(col("n") >= 5,
          sort_array(array_distinct(transform(sequence(lit(1), col("n") - 4),
            i => col("text").substr(i, lit(5))))))
          .otherwise(array().cast("array<string>")).as("g"))
    val a = grams(docs.filter(col("doc_id") % 10 === 0))
      .select(col("doc_id").as("a_id"), col("g").as("ga"))
    val b = grams(docs.filter(col("doc_id") % 10 === 1))
      .select(col("doc_id").as("b_id"), col("g").as("gb"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .withColumn("n_common", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("ga"), col("gb")))
      .withColumn("n_a", size(col("ga")).cast("long"))
      .withColumn("n_b", size(col("gb")).cast("long"))
      .select(col("a_id"), col("b_id"), col("n_common"), col("n_a"), col("n_b"),
        // guarded: two sub-5-char docs have empty gram arrays and d6 has
        // no threshold filter to drop them — 0/0 throws under ANSI
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .otherwise(0.0).as("jaccard"))
      .orderBy(col("a_id"))
  }

  /** Dedup clusters: connected components over the verified near-dup
    * pairs (d3's graph), labeling every clustered doc with its
    * component's min doc id. This is the step that turns pairwise
    * near-dup hits into "keep one canonical doc per cluster" — without
    * it, A~B and B~C can both drop their right-hand doc while A~C was
    * never compared. Label propagation is a per-round equi-join +
    * groupBy-min on the (tiny) pair graph, never on the corpus. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val sh = Dedup.shingleFrame(docs).persist()
    // the signature frame feeds BOTH sides of the candidate band
    // self-join — persisted like d3's (r16 plan audit: unpersisted, the
    // md5+array_min signature projection re-ran once per join side)
    val sigs = Dedup.signaturesFromShingles(sh).persist()
    try {
      val cand = Dedup.candidatePairs(sigs)
      val pairs = Dedup.verifyJaccardOnShingles(sh, cand, 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(pairs)
    } finally {
      // CC materialized every read of the pair graph before returning
      // (its result is backed by its own persisted RDD), so the shingle
      // and signature frames can be released eagerly instead of leaking
      // into the session — including when CC throws on non-convergence
      sigs.unpersist()
      sh.unpersist()
    }
  }

  /** Apply dedup: the corpus that SURVIVES near-dup removal — each d7
    * cluster keeps only its min-id (canonical) member, every
    * unclustered doc passes through. This is the step a curation
    * pipeline actually ships: d3/d7 only REPORT duplicates; this emits
    * the deduplicated doc set, each survivor tagged with how many
    * corpus docs it now represents (its cluster size, 1 when
    * unclustered). Exact duplicates need no separate pass — identical
    * texts have identical MinHash signatures and Jaccard 1.0, so they
    * are always cluster-mates of their copies. Scale shape: the
    * cluster label frame is pair-graph-sized — usually ≪ corpus, so
    * AQE converts the anti-join and the size lookup to broadcast joins
    * at runtime (the label frame sits behind an ExistingRDD with no
    * static stats, so the conversion is AQE's, after the label
    * exchange materializes) and the corpus is never shuffled; when
    * dups ARE corpus-proportional a broadcast would OOM, and the same
    * plan degrades to shuffled equi-joins on doc_id instead — which is
    * why the broadcast is deliberately not forced with a hint. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame =
    dedupApplyOn(Tables(spark, dir).documents, dupClusters(spark, dir))

  /** The library composition form of d8: apply a PRE-COMPUTED
    * (doc_id, cluster_id) frame — d7's output, persisted or checkpointed
    * once per pipeline — to the corpus. A real curation job runs CC
    * once and feeds the frame to every consumer (survivor filter,
    * size accounting, curatePack); the registered standalone query
    * recomputes it only because each gate query must be self-contained.
    * Spec-asserted equal to the registered query's output. */
  def dedupApplyOn(docs: DataFrame, clusters: DataFrame): DataFrame =
    graft.ext.Curation.applyCanonical(docs, clusters)

  /** Incremental near-dup: dedup a NEW batch (doc_id % 5 = 0 — "today's
    * ingest") against the already-indexed rest of the corpus. The first
    * call builds the index — Dedup.writeNeardupIndex persists the corpus
    * side's (sh, sigs, bands) as parquet, exactly the artifact a corpus
    * team maintains between ingests; subsequent calls (and every rep the
    * bench times after the first) reuse it via its _SUCCESS marker, so
    * the measured query is the OPERATIONAL shape: shingle the batch
    * only, band-join against the index's pruned (doc_id, band0, band1)
    * scan, exact-verify against its stored `sh` arrays. The corpus text
    * is never re-tokenized — spec-asserted on the plan (one
    * documents.parquet scan, batch side only). */
  def incrementalNeardup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idx = ensureNeardupIndex(spark, dir)
    Dedup.incrementalNeardup(spark, docs.filter(col("doc_id") % 5 === 0), idx, 0.8)
  }

  /** d9 with the recall-PRESERVING salt-split armed on the batch×index
    * cross screen ([[graft.ext.SkewGuard.saltedCrossJoinPairs]]'s 2-D
    * grid: hot posting lists split into bounded sub-buckets on BOTH
    * sides' occupancy, each side fanned across the other's sub-bucket
    * axis so every pair meets at exactly one cell). maxBucket = 2 is
    * the demo dial — at sf0.01 nearly every duplicate-cluster bucket
    * exceeds it, so the split machinery is genuinely exercised; the
    * oracle is d9's verbatim, making the recall claim ("armed output
    * EQUALS the unguarded screen") hash-checked cross-engine rather
    * than spec-asserted — the cross-screen analog of
    * d3_neardup_salted. */
  def incrementalNeardupSalted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idx = ensureNeardupIndex(spark, dir)
    Dedup.incrementalNeardup(spark, docs.filter(col("doc_id") % 5 === 0), idx,
      0.8, maxBucket = 2, skewMode = "salt")
  }

  /** d9 against a WRITE-TIME-CAPPED index (r14 verdict #5): the index
    * is built by [[graft.ext.Dedup.writeNeardupIndex]]'s maxBucket arm —
    * corpus band values whose posting list exceeds the cap are NULLed
    * in the STORED rows — and the screen then runs with the guard OFF.
    * This is the production recipe's foundation (ProbeZipfMerge stage 1:
    * the armed pipeline that finishes the zipf decade in 131 s where
    * the unguarded build DNFs at 66 GB of spill) and until this
    * registration it had no hash-checked witness — d14b_merge_capped
    * pins the SCREEN-side caps only. The oracle mirrors the write-time
    * cap in SQL (corpus posting lists at occupancy <= 1 — maxBucket = 1,
    * the demo dial at which the cap provably bites at sf0.01, the
    * d14b_merge_capped discipline), making writeNeardupIndex's stored-
    * NULL contract ("capped write + guard off == uncapped index +
    * drop-armed screen") cross-engine-checked rather than only
    * spec-asserted. */
  def incrementalNeardupCappedIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idx = ensureCappedNeardupIndex(spark, dir)
    Dedup.incrementalNeardup(spark, docs.filter(col("doc_id") % 5 === 0), idx, 0.8)
  }

  /** Incremental cluster MAINTENANCE: today's ingest (doc_id % 5 = 0)
    * folded into the standing cluster labels of the already-indexed
    * corpus (the rest) via [[graft.ext.Dedup.mergeIntoClusters]] — the
    * operational closure of d9: the screens find new PAIRS
    * incrementally; this turns them into updated LABELS without
    * re-clustering the corpus. Output hash-matches a from-scratch d7
    * over the COMBINED corpus (the oracle is d7's verbatim): the
    * standing labeling is a star forest with the same connectivity as
    * the corpus pair graph, so CC over (star edges ∪ new pairs) yields
    * identical components and identical min-id labels.
    *
    * Standalone-query price (the d8/d10/d13 precedent): the standing
    * labels are recomputed here from the index because every gate query
    * must be self-contained; a production pipeline stores them and pays
    * only the merge — whose CC input is |labels| + |new pairs| edges,
    * never the corpus (spec-asserted in MergeClustersSpec). Plan shape:
    * the corpus side comes entirely from the index parquet (bands for
    * candidates, stored `sh` for verify — no re-tokenization); the
    * batch is shingled ONCE (persisted) and feeds its own signature,
    * batch-internal-pair, and cross-pair stages. */
  def incrementalClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val index = Dedup.readNeardupIndex(spark, ensureNeardupIndex(spark, dir))
    val corpusPairs = Dedup.verifyJaccardOnShingles(
        index.select(col("doc_id"), col("sh")),
        Dedup.candidatePairs(index), 0.8)
      .select(col("a_id"), col("b_id"))
    mergeBatchInto(docs, index, Dedup.connectedComponents(corpusPairs))
  }

  /** d14's INGEST side, shared by the standalone form and its b-form:
    * shingle only the batch (doc_id % 5 = 0), find batch-internal and
    * batch×index pairs (index bands for candidates, stored `sh` for
    * verify — the corpus text is never re-tokenized), and fold them
    * into the given standing labels via [[graft.ext.Dedup.mergeIntoClusters]].
    * The merge's CC input is |labels| + |new pairs| edges, never the
    * corpus. */
  private def mergeBatchInto(docs: DataFrame, index: DataFrame,
                             labels: DataFrame): DataFrame = {
    val iSh = index.select(col("doc_id"), col("sh"))
    val bsh = graft.core.CacheScope.track(
      Dedup.shingleFrame(docs.filter(col("doc_id") % 5 === 0)).persist())
    val bSigs = graft.core.CacheScope.track(
      Dedup.signaturesFromShingles(bsh).persist())
    val batchPairs = Dedup.verifyJaccardOnShingles(bsh,
        Dedup.candidatePairs(bSigs), 0.8)
      .select(col("a_id"), col("b_id"))
    val bBands = bSigs.select(col("doc_id").as("batch_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx", "band_hash")))
    val iBands = index.select(col("doc_id").as("corpus_id"),
      posexplode(array(col("band0"), col("band1")))
        .as(Seq("band_idx_b", "band_hash_b")))
    val cand = bBands.join(iBands,
        col("band_idx") === col("band_idx_b") &&
        col("band_hash") === col("band_hash_b"))
      .select(col("batch_id"), col("corpus_id")).distinct()
    val crossPairs = Dedup.verifyJaccardAcross(bsh, iSh, cand, 0.8,
        "batch_id", "corpus_id")
      .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
    Dedup.mergeIntoClusters(labels, batchPairs.union(crossPairs))
  }

  /** Quality-aware canonical selection: for each d7 cluster, the member
    * a curation pipeline should KEEP — the highest-quality doc, not the
    * arbitrary min-id. d8's min-id convention is the right cluster
    * LABEL (stable, computable inside CC), but real pipelines pick the
    * representative by content quality (longest/cleanest member — the
    * near-dup cluster often mixes a full article with truncated or
    * boilerplate-wrapped copies). Scale shape: quality is projected
    * ONLY for cluster members — the corpus-sized documents scan is
    * probe side of a join whose build side is the pair-graph-sized
    * label frame (AQE broadcasts it), and the per-cluster argmax is a
    * single hash agg via max_by, no sort window. Ties (identical texts
    * have identical quality) break to the smaller doc_id, so the
    * output is deterministic at any partitioning. */
  def clusterBest(spark: SparkSession, dir: String): DataFrame =
    clusterBestOn(Tables(spark, dir).documents, dupClusters(spark, dir))

  /** Library composition form of d10: pick representatives from a
    * PRE-COMPUTED (doc_id, cluster_id) frame (see dedupApplyOn). */
  def clusterBestOn(docs: DataFrame, clusters: DataFrame): DataFrame =
    graft.ext.Curation.clusterBest(docs, clusters)

  /** Cross-source dedup (d18): each near-dup cluster keeps the member
    * from the highest-priority source ([[graft.ext.Curation.clusterBySource]]).
    * The registration derives the priority registry from the corpus
    * itself — alphabetical rank of the distinct source names (a
    * stand-in for the curated "wiki > news > CC" table a real pipeline
    * ships) — so the oracle can rebuild the identical registry in SQL.
    * The rank window runs over the DISTINCT source list (registry-
    * sized, ~dozens of rows), never the corpus. */
  def crossSourceDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    graft.ext.Curation.clusterBySource(docs, dupClusters(spark, dir),
      sourcePrio(docs))
  }

  /** The derived priority registry d18 and its b-form share — ONE
    * owner, so a future tie-break/ordering change cannot silently
    * diverge the consumer from the parent whose oracle it shares.
    * Window over the DISTINCT source list: registry-sized, never the
    * corpus. */
  private def sourcePrio(docs: DataFrame): DataFrame =
    docs.select(col("source")).distinct()
      .withColumn("prio", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source")))
        .cast("long"))

  /** PRECOMPUTED-cluster consumers (r11 ask #5): at 100 TB the
    * shingle→band→verify→CC pipeline runs ONCE and its (doc_id,
    * cluster_id) frame is materialized for every downstream consumer —
    * d8/d13/d18 recompute it per query only because each gate query
    * must be self-contained. These registrations price the CONSUMER:
    * the cluster frame is a parquet fixture built untimed (d7's output
    * via [[dupClusters]], IndexStore-committed once per sf dir through
    * [[prepareFixtures]]), and each query is the library composition
    * form over that read. Clusters are a deterministic function of the
    * corpus, so each b-form shares its parent's oracle VERBATIM — the
    * fixture path is hash-checked against the full relational rebuild
    * every round (the d9_salted shared-oracle precedent). */
  private def clustersPathFor(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.pathFor(spark, "dup-clusters", dir)

  /** The unguarded-screen pre-flight (r14 verdict #3): the fixture
    * builders run the EXACT unguarded pipelines (oracle parity is their
    * reason to exist), and pointing one at a boilerplate-heavy corpus
    * dies by spill, not by error — the r14 zipf measurement spilled
    * 66 GB before being killed. One linear band-histogram pass refuses
    * first, naming the armed recipe. Priced once per FIXTURE BUILD
    * (untimed, once per sf dir), never per query; the threshold dial is
    * `spark.graft.dedup.maxUnguardedBucket` (default 1000 — every sf
    * testdata dir sits at single-digit occupancy, the zipf decade in
    * the tens of thousands). */
  private def refuseIfHot(spark: SparkSession, sigs: DataFrame,
                          what: String): Unit =
    // the conf parse is loud and named in Dedup.maxUnguardedBucket
    // (r15 advisor: a malformed value used to die as a bare
    // NumberFormatException mid-fixture-build)
    Dedup.refuseHotBuckets(sigs, Dedup.maxUnguardedBucket(spark), what)

  private def ensureClusters(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.ensure(spark, clustersPathFor(spark, dir)) { scratch =>
      refuseIfHot(spark, Dedup.signaturesFromShingles(
          Dedup.shingleFrame(Tables(spark, dir).documents)),
        s"dup-clusters fixture build over $dir")
      dupClusters(spark, dir).write.mode("overwrite").parquet(scratch)
    }

  /** The STANDING-labels fixture d14's b-form reads: CC over the
    * neardup index's own verified pair graph (corpus side = doc_id % 5
    * =!= 0) — exactly the (doc_id, cluster_id) frame a production
    * ingest pipeline persists between batches, and exactly what d14's
    * standalone form recomputes per query. Built once per sf dir,
    * untimed, through the same marker-last publish as every fixture. */
  private def idxLabelsPathFor(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.pathFor(spark, "idx-labels", dir)

  private def ensureIdxLabels(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.ensure(spark, idxLabelsPathFor(spark, dir)) { scratch =>
      val index = Dedup.readNeardupIndex(spark, ensureNeardupIndex(spark, dir))
      // here the histogram is a column-pruned (band0, band1) scan of
      // the index parquet — no re-tokenization
      refuseIfHot(spark, index, s"idx-labels fixture build over $dir")
      val corpusPairs = Dedup.verifyJaccardOnShingles(
          index.select(col("doc_id"), col("sh")),
          Dedup.candidatePairs(index), 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.connectedComponents(corpusPairs)
        .write.mode("overwrite").parquet(scratch)
    }

  /** Build the dedup-tier fixtures the b-form consumers read — chained
    * from [[graft.SparkEntry.prepareFixtures]]. Skips quietly on dirs
    * without a documents table (partial scale replicas). */
  def prepareFixtures(spark: SparkSession, dir: String): Unit =
    if (Tables.exists(spark, dir, "documents")) {
      ensureClusters(spark, dir)
      ensureIdxLabels(spark, dir)
      ensureCappedNeardupIndex(spark, dir)
      ensureLabelsLogFixture(spark, dir)
    }

  /** The STANDING delta-mode labels log d14d's per-rep scratch copies
    * derive from: the idx-labels fixture landed once as an Upsert
    * table (base generation, ver = 0). Production's log is standing
    * too — per-trigger cost never includes a re-init. Single-JVM
    * fixture-build discipline (prepareFixtures), guarded by the
    * manifest probe. */
  private def ensureLabelsLogFixture(spark: SparkSession, dir: String): String = {
    val path = graft.core.IndexStore.pathFor(spark, "idx-labels-log", dir)
    if (!graft.ext.Upsert.isTable(spark, path))
      graft.ext.Upsert.init(
        spark.read.parquet(ensureIdxLabels(spark, dir))
          .withColumn("ver", lit(0L)),
        path, "doc_id", Seq("ver"), n = 8)
    path
  }

  private def storedClusters(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensureClusters(spark, dir))

  def dedupApplyPre(spark: SparkSession, dir: String): DataFrame =
    dedupApplyOn(Tables(spark, dir).documents, storedClusters(spark, dir))

  def dedupApplyBestPre(spark: SparkSession, dir: String): DataFrame =
    dedupApplyBestOn(Tables(spark, dir).documents, storedClusters(spark, dir))

  def crossSourceDedupPre(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    graft.ext.Curation.clusterBySource(docs, storedClusters(spark, dir),
      sourcePrio(docs))
  }

  /** d10's b-form: representatives over the committed cluster fixture —
    * prices what the selection step costs once clustering is a standing
    * table (parent oracle verbatim). */
  def clusterBestPre(spark: SparkSession, dir: String): DataFrame =
    clusterBestOn(Tables(spark, dir).documents, storedClusters(spark, dir))

  /** d14's b-form: the ingest merge priced as a production pipeline
    * pays it — standing labels READ from the committed idx-labels
    * fixture (never recomputed), batch shingle + batch/cross pairs +
    * [[graft.ext.Dedup.mergeIntoClusters]] as the measured work. Shares
    * d14's (= d7's) oracle verbatim: the fixture is a deterministic
    * function of the corpus, so the merged labels must equal the
    * from-scratch clustering of the combined corpus bit-for-bit. */
  def incrementalClustersPre(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val index = Dedup.readNeardupIndex(spark, ensureNeardupIndex(spark, dir))
    val labels = spark.read.parquet(ensureIdxLabels(spark, dir))
    mergeBatchInto(docs, index, labels)
  }

  /** d14b with BOTH batch screens armed by the recall-preserving
    * salt-split — the form the 500k-doc decade row mandates: on a
    * cluster-inflated corpus the unguarded band buckets grow with the
    * hot family and candidate pairs grow quadratically in them
    * (BASELINE r13: 88.6 s unguarded at 500k, the d3 class). The
    * batch-internal screen takes [[graft.ext.Dedup.candidatePairsSalted]],
    * the cross screen [[graft.ext.Dedup.incrementalNeardup]]'s salt
    * arm; both are output-INVARIANT (every pair still meets at exactly
    * one salt cell), so this registration shares d14's from-scratch d7
    * oracle VERBATIM — the recall claim is hash-checked cross-engine,
    * the d3_neardup_salted / d9_incremental_salted precedent applied
    * to the merge's ingest side. maxBucket = 2 is the demo dial (at
    * sf0.01 nearly every bucket exceeds it, so the machinery is
    * genuinely exercised). */
  def incrementalClustersSalted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idxPath = ensureNeardupIndex(spark, dir)
    val labels = spark.read.parquet(ensureIdxLabels(spark, dir))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // one shingle + signature projection for BOTH screens (r16: the
    // cross screen used to re-shingle the batch inside
    // incrementalNeardup); bSigs persisted — three join sides read it
    val bsh = graft.core.CacheScope.track(Dedup.shingleFrame(batch).persist())
    val bSigs = graft.core.CacheScope.track(
      Dedup.signaturesFromShingles(bsh).persist())
    val cross = Dedup.incrementalNeardupOnShingles(spark, bsh, bSigs, idxPath,
        0.8, maxBucket = 2, skewMode = "salt")
      .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
    val internal = Dedup.verifyJaccardOnShingles(bsh,
        Dedup.candidatePairsSalted(bSigs, maxBucket = 2), 0.8)
      .select(col("a_id"), col("b_id"))
    Dedup.mergeIntoClusters(labels, internal.union(cross))
  }

  /** d14b with BOTH batch screens under the d3_capped DROP discipline
    * (r13 verdict #4): band buckets above maxBucket are dropped before
    * either candidate join — the batch-internal screen through
    * [[graft.ext.Dedup.candidatePairs]]'s cap, the cross screen through
    * [[graft.ext.Dedup.incrementalNeardup]]'s "drop" arm (which caps
    * the INDEX posting lists). Unlike the salted twin this CHANGES the
    * output — pairs that only meet in a hot bucket never reach the
    * merge — so the registration carries its own oracle that mirrors
    * both caps in SQL (the d3_neardup_capped discipline applied to the
    * merge): the recall contract is hash-checked cross-engine, not
    * asserted. Why it exists: d14b_merge_pre's decade row grows ~15x
    * per 100x docs on a replica-inflated corpus because batch screens
    * are quadratic in hot-bucket occupancy (BASELINE r13); the cap
    * bounds candidate pairs per bucket at maxBucket², making the
    * ingest screens corpus-linear. maxBucket = 1 is the demo dial —
    * deliberately one BELOW the salted twin's, because the %5 batch
    * split leaves every sf0.01 bucket at occupancy <= 2 and a cap of 2
    * would never bite (measured: identical candidate counts) — at 1
    * the cross screen provably drops posting lists (15 -> 13
    * candidates at sf0.01, one singleton doc leaves the graph) and the
    * internal screen drops to zero pairs (a singleton bucket cannot
    * self-pair), both visible in the final label hash. Production
    * sizes the cap above expected duplicate-family size and drops only
    * degenerate boilerplate, or uses the salted twin where recall must
    * be exact. */
  def incrementalClustersCapped(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idxPath = ensureNeardupIndex(spark, dir)
    val labels = spark.read.parquet(ensureIdxLabels(spark, dir))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // shared shingle/signature frames — see the salted twin's note
    val bsh = graft.core.CacheScope.track(Dedup.shingleFrame(batch).persist())
    val bSigs = graft.core.CacheScope.track(
      Dedup.signaturesFromShingles(bsh).persist())
    val cross = Dedup.incrementalNeardupOnShingles(spark, bsh, bSigs, idxPath,
        0.8, maxBucket = 1, skewMode = "drop")
      .select(col("batch_id").as("a_id"), col("corpus_id").as("b_id"))
    val internal = Dedup.verifyJaccardOnShingles(bsh,
        Dedup.candidatePairs(bSigs, maxBucket = 1), 0.8)
      .select(col("a_id"), col("b_id"))
    Dedup.mergeIntoClusters(labels, internal.union(cross))
  }

  /** The STREAMING label maintainer priced over the standard batch
    * split (r14 verdict #7): [[graft.streaming.StreamClusters.labelMaintainer]]
    * is the one dedup surface with specs but no timed witness — this
    * runs its exact foreachBatch body (cross screen + internal screen +
    * mergeIntoClusters + atomic replace publish) on the d14b shape:
    * batch = doc_id % 5 = 0, standing index + idx-labels fixture as the
    * generation-1 state. Each invocation seeds a FRESH scratch labels
    * artifact from the committed fixture (the maintainer replaces its
    * artifact in place — a reused path would make rep N's merge input
    * rep N-1's output), so every bench rep measures the same work. The
    * timed window deliberately includes the artifact copy + replace
    * write: that is the operational cost a micro-batch actually pays.
    * Registered as d14c_merge_stream with d14's from-scratch d7 oracle
    * VERBATIM (the d14b_merge_pre precedent: the merge over standing
    * labels is connectivity-preserving), so the STREAMING path itself
    * is hash-checked cross-engine every round, not just spec-pinned
    * equal to the batch twin. */
  def mergeViaStreamMaintainer(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val idxPath = ensureNeardupIndex(spark, dir)
    val labelsFixture = ensureIdxLabels(spark, dir)
    val scratch = streamLabelsScratch()
    // replace, not ensure: the path is invocation-fresh so both always
    // build, but ensure's buildsThisJvm counter exists to mark
    // ARTIFACT-COLD sessions — a per-rep scratch seed inflating it to
    // >= reps diluted the "0 = standing-artifact session" reading of
    // every full bench (r15 advisor)
    graft.core.IndexStore.replace(spark, scratch) { s =>
      spark.read.parquet(labelsFixture).write.mode("overwrite").parquet(s)
    }
    graft.streaming.StreamClusters.labelMaintainer(idxPath, scratch, 0.8)(
      docs.filter(col("doc_id") % 5 === 0), 0L)
    graft.core.IndexStore.read(spark, scratch,
      "stream labels", "StreamClusters.labelMaintainer")
  }

  /** The DELTA-PUBLISH twin of [[mergeViaStreamMaintainer]] (r15
    * verdict #1): the same foreachBatch body over the same fixtures,
    * publishing through the merge-on-read labels log — per-trigger
    * write = only the CHANGED labels as a committed `delta=<batchId>`
    * dir over an untouched base ([[graft.streaming.StreamClusters]]'s
    * `publish = "delta"`), the mode whose publish I/O is proportional
    * to the batch rather than the standing corpus. Each invocation
    * seeds a fresh base log from the committed label fixture (so every
    * rep measures the same work: init + merge + delta append + merged
    * read — the full operational cost of a delta-mode trigger), and
    * the returned frame is the base+delta latest-per-key view.
    * Registered as d14d_merge_stream_mor with d14's from-scratch d7
    * oracle VERBATIM: base+delta must reconstruct exactly the labeling
    * the full-rewrite publisher commits, hash-checked cross-engine. */
  def mergeViaStreamMaintainerMor(spark: SparkSession, dir: String): DataFrame = {
    val scratch = runDeltaMaintainerOnScratchLog(spark, dir)
    graft.streaming.StreamClusters.readLabels(spark, scratch)
  }

  /** The INCREMENTAL-CONSUMER read over the streamed labels log (the
    * point of keeping deltas at all): after the delta-publish trigger,
    * `Upsert.changeFeed` serves exactly the labels the batch CHANGED —
    * relabeled standing docs plus newly labeled batch docs — at
    * delta-dir cost, never a base scan. Registered as
    * d14e_merge_changefeed with its own cross-engine oracle: the
    * from-scratch d7 labeling of the combined corpus MINUS the
    * from-scratch labeling of the corpus side alone (a (doc_id,
    * cluster_id) anti-join — a row is in the feed iff the batch merge
    * created or moved it), so the delta CONTENT itself is
    * hash-checked, not just the merged end state (d14d). */
  def mergeStreamChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val scratch = runDeltaMaintainerOnScratchLog(spark, dir)
    graft.ext.Upsert.changeFeed(spark, scratch, -1L, 0L)
      .select(col("doc_id"), col("cluster_id"))
  }

  /** Shared body of the two delta-publish mirrors: copy the standing
    * log fixture to an invocation-fresh scratch (driver-side
    * FileUtil copy — production's base log is standing; re-initing per
    * trigger would bill the bootstrap to every micro-batch, measured
    * ~2.5 s of pure seeding at sf0.1), then run one armed-off
    * delta-publish trigger over the standard %5 batch. */
  private def runDeltaMaintainerOnScratchLog(spark: SparkSession,
                                             dir: String): String = {
    val docs = Tables(spark, dir).documents
    val idxPath = ensureNeardupIndex(spark, dir)
    val logFixture = ensureLabelsLogFixture(spark, dir)
    val scratch = streamLabelsScratch()
    val conf = spark.sessionState.newHadoopConf()
    val srcP = new org.apache.hadoop.fs.Path(logFixture)
    val dstP = new org.apache.hadoop.fs.Path(scratch)
    org.apache.hadoop.fs.FileUtil.copy(
      srcP.getFileSystem(conf), srcP, dstP.getFileSystem(conf), dstP,
      false, conf)
    graft.streaming.StreamClusters.labelMaintainer(idxPath, scratch, 0.8,
      publish = "delta")(docs.filter(col("doc_id") % 5 === 0), 0L)
    scratch
  }

  /** Invocation-fresh labels scratch, registered for JVM-exit cleanup:
    * the returned frame is lazy, so the dir can't be deleted before the
    * caller's terminal action — unregistered, each invocation leaked
    * one tmpdir directory per rep (r15 advisor / verdict #6). */
  private def streamLabelsScratch(): String =
    graft.core.ScratchDirs.register(
      new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-stream-labels-${java.util.UUID.randomUUID().toString.take(8)}")
        .getAbsolutePath)

  /** Containment near-dup: pairs where the SMALLER doc's shingle set is
    * >= 90% contained in the other — doc-inside-doc duplication that
    * symmetric Jaccard (d3) misses. Same LSH candidate machinery as d3
    * (shingle once, band-join, verify only candidates); only the verify
    * formula differs. Recall caveat on the banding documented at
    * [[graft.ext.Dedup.verifyContainmentOnShingles]]. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val sh = graft.core.CacheScope.track(Dedup.shingleFrame(docs).persist())
    val cand = Dedup.candidatePairs(Dedup.signaturesFromShingles(sh))
    Dedup.verifyContainmentOnShingles(sh, cand, 0.9)
  }

  /** d8 with d10's representative rule: the surviving corpus where each
    * near-dup cluster keeps its HIGHEST-QUALITY member (not the min-id
    * label) — the decision a production curation pipeline actually
    * ships. Same survivor/accounting contract as d8 (unclustered docs
    * pass through with n_merged = 1, survivors sum to the corpus), same
    * adaptive join shape (label/best frames are pair-graph-sized; no
    * forced broadcast); only the representative changes. */
  def dedupApplyBest(spark: SparkSession, dir: String): DataFrame =
    dedupApplyBestOn(Tables(spark, dir).documents, dupClusters(spark, dir))

  /** Library composition form of d13 over a pre-computed cluster frame:
    * derives the per-cluster best via [[clusterBestOn]], drops every
    * other member, and tags each kept representative with its cluster
    * size. */
  def dedupApplyBestOn(docs: DataFrame, clusters: DataFrame): DataFrame =
    graft.ext.Curation.applyBest(docs, clusters)

  /** Complete-recall containment join at 9/10 — the prefix-filtered
    * exact path (see [[graft.ext.Dedup.containmentJoin]]) that finds
    * EVERY doc-inside-doc pair, including the extreme-asymmetry ones
    * MinHash banding (d11) can miss. Spec-asserted equal to the
    * brute-force all-pairs containment at test scale and a superset of
    * d11's output. */
  def containmentJoin(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentJoin(
      Dedup.shingleFrame(Tables(spark, dir).documents), 9, 10)

  /** d12 in its documented 100 TB OPERATING MODE: the complete-recall
    * containment join over a suspect SLICE (here doc_id % 2 = 0) rather
    * than the raw corpus. Complete recall makes the raw-corpus
    * candidate set grow with df × cluster size — measured at the sf10
    * replica it exceeds the sandbox's disk (BASELINE.md round-6) —
    * which is exactly why `Dedup.containmentJoin`'s scaladoc scopes it
    * to slices; registering the sliced form makes that operating mode
    * itself oracle-checked (recall is complete WITHIN the slice: the
    * prefix theorem holds under the slice's own df order). */
  def containmentJoinSlice(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentJoin(
      Dedup.shingleFrame(
        Tables(spark, dir).documents.filter(col("doc_id") % 2 === 0)),
      9, 10)

  /** Per-sf-dir index location: stable across calls (reuse is the point)
    * yet collision-free across scale factors. The BASE directory is
    * caller-supplied via `spark.graft.index.dir` (any Hadoop-FS URI —
    * hdfs://, s3a://, file:); driver-local java.io.tmpdir is only the
    * standalone-query fallback for this sandbox. */
  private[queries] def indexPathFor(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.pathFor(spark, "neardup-index", dir)

  /** Build-if-absent of the shared neardup index (corpus side =
    * doc_id % 5 =!= 0) — the ONE copy of the build closure d9/d14 and
    * the label fixture all go through. */
  private def ensureNeardupIndex(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.ensure(spark, indexPathFor(spark, dir)) { scratch =>
      Dedup.writeNeardupIndex(
        Tables(spark, dir).documents.filter(col("doc_id") % 5 =!= 0), scratch)
    }

  /** The write-time-capped twin of [[ensureNeardupIndex]] (same corpus
    * side, maxBucket = 1 — hot posting lists NULLed in the stored
    * rows), read by d9_incremental_capidx. Built untimed via
    * [[prepareFixtures]] like every fixture. */
  private def ensureCappedNeardupIndex(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.ensure(spark,
        graft.core.IndexStore.pathFor(spark, "neardup-index-capped", dir)) {
      scratch =>
        Dedup.writeNeardupIndex(
          Tables(spark, dir).documents.filter(col("doc_id") % 5 =!= 0),
          scratch, "text", "doc_id", maxBucket = 1)
    }

  /** D19 — corpus-level span dedup, the CCNet/RefinedWeb paragraph-
    * dedup step adapted to the flat synthetic text (no newlines, so a
    * "paragraph" is a fixed 20-token non-overlapping span — the same
    * synthetic segmentation x_chunk_docs uses): every exact span
    * keeps its corpus-FIRST occurrence (min doc_id, then span_id) and
    * drops the rest, reported with its corpus-wide copy count.
    *
    * Scale shape: tokenize → explode spans (corpus-span-sized) →
    * ONE hash aggregation keyed by span text (`min_by` + count — both
    * partial-aggregable, so a boilerplate span repeated millions of
    * times ships one candidate row per partition, never a pair join).
    * No join back: the winner row IS the output. Reassembly of
    * surviving text is a downstream per-doc sort-concat. */
  def spanDedup(spark: SparkSession, dir: String, span: Int = 20): DataFrame = {
    val spans = Tables(spark, dir).documents
      .select(col("doc_id"), split(col("text"), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("span_id", explode(
        sequence(lit(0L), expr(s"(__n + ${span - 1}) div $span") - 1)))
      .select(col("doc_id"), col("span_id"),
        concat_ws(" ",
          slice(col("__toks"), (col("span_id") * span + 1).cast("int"),
            lit(span))).as("__span"))
    spans.groupBy(col("__span"))
      .agg(
        min_by(struct(col("doc_id"), col("span_id")),
          struct(col("doc_id"), col("span_id"))).as("__w"),
        count(lit(1)).as("n_copies"))
      .select(col("__w.doc_id").as("doc_id"),
        col("__w.span_id").as("span_id"), col("n_copies"))
      .orderBy(col("doc_id"), col("span_id"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d19_span_dedup"   -> ((s: SparkSession, d: String) => spanDedup(s, d)),
    "d1_exact_dedup"   -> (exactDedup _),
    "d2_minhash_sigs"  -> (minhashSigs _),
    "d3_neardup_pairs" -> (neardupPairs _),
    "d3_neardup_capped" -> (neardupPairsCapped _),
    "d3_neardup_salted" -> (neardupPairsSalted _),
    "d4_simhash"       -> (simhashes _),
    "d5_simhash_pairs" -> (simhashPairs _),
    "d6_ngram_jaccard" -> (ngramJaccard _),
    "d7_dup_clusters"  -> (dupClusters _),
    "d8_dedup_apply"   -> (dedupApply _),
    "d9_incremental_neardup" -> (incrementalNeardup _),
    "d9_incremental_salted" -> (incrementalNeardupSalted _),
    "d9_incremental_capidx" -> (incrementalNeardupCappedIndex _),
    "d10_cluster_best" -> (clusterBest _),
    "d11_containment"  -> (containmentPairs _),
    "d12_containment_join" -> (containmentJoin _),
    "d12_containment_slice" -> (containmentJoinSlice _),
    "d13_dedup_apply_best" -> (dedupApplyBest _),
    "d14_incremental_clusters" -> (incrementalClusters _),
    "d15_winnow_spans" -> (winnowSpans _),
    "d15_winnow_capped" -> (winnowSpansCapped _),
    "d16_winnow_extents" -> (winnowExtents _),
    "d17_lsh_recall_audit" -> (lshRecallAudit _),
    "d18_cross_source_dedup" -> (crossSourceDedup _),
    "d8b_dedup_apply_pre"    -> (dedupApplyPre _),
    "d13b_apply_best_pre"    -> (dedupApplyBestPre _),
    "d18b_cross_source_pre"  -> (crossSourceDedupPre _),
    "d10b_cluster_best_pre"  -> (clusterBestPre _),
    "d14b_merge_pre"         -> (incrementalClustersPre _),
    "d14b_merge_salted"      -> (incrementalClustersSalted _),
    "d14b_merge_capped"      -> (incrementalClustersCapped _),
    "d14c_merge_stream"      -> (mergeViaStreamMaintainer _),
    "d14d_merge_stream_mor"  -> (mergeViaStreamMaintainerMor _),
    "d14e_merge_changefeed"  -> (mergeStreamChangeFeed _)
  )

  // ---- DuckDB oracles ----

  private val toksSql = "string_split_regex(text, '\\s+')"
  // shared with AnalysisQueries' decontamination oracle
  private[queries] val shSql =
    s"""list_distinct(list_transform(range(1, greatest(len($toksSql) - 1, 1)),
       |  i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2]))""".stripMargin
  private def sigSql(k: Int) =
    s"list_aggregate(list_transform(sh, s -> substr(md5(s), ${8 * k + 1}, 8)), 'min')"

  private val sigsCte =
    s"""WITH shingled AS (
       |  SELECT doc_id, $shSql AS sh FROM documents
       |), sigs AS (
       |  SELECT doc_id, ${sigSql(0)} AS sig0, ${sigSql(1)} AS sig1,
       |         ${sigSql(2)} AS sig2, ${sigSql(3)} AS sig3
       |  FROM shingled
       |), banded AS (
       |  SELECT doc_id, sig0, sig1, sig2, sig3,
       |         md5(sig0 || sig1) AS band0, md5(sig2 || sig3) AS band1
       |  FROM sigs
       |)""".stripMargin

  private val simhashCte = {
    val nHex = graft.ext.Dedup.simhashBits / 4
    val v = graft.ext.Dedup.hexValSql(s"substr(md5(t),1,$nHex)", nHex)
    val bitSums = (0 until graft.ext.Dedup.simhashBits)
      .map(j => s"SUM(CASE WHEN (v // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val sim = (0 until graft.ext.Dedup.simhashBits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct($toksSql)) AS t FROM documents
       |), vals AS (
       |  SELECT doc_id, $v AS v FROM tok
       |), bits AS (
       |  SELECT doc_id, $bitSums FROM vals GROUP BY doc_id
       |), sim AS (
       |  SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM bits
       |)""".stripMargin
  }

  /** The from-scratch d7 oracle — shared verbatim by d7_dup_clusters
    * and d14_incremental_clusters (the star-forest merge is
    * connectivity-preserving, so incremental labels equal from-scratch
    * labels on the combined corpus). */
  private val d7OracleSql =
    s"""$ccCte
       |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** The unguarded d3 oracle — shared verbatim by d3_neardup_pairs and
    * d3_neardup_salted (the salt-split guard is output-invariant). */
  private val d3OracleSql =
    s"""$sigsCte, bands AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |), verified AS (
       |  SELECT a_id, b_id,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
       |    CAST(len(sa.sh) AS BIGINT) AS n_a,
       |    CAST(len(sb.sh) AS BIGINT) AS n_b
       |  FROM cand
       |  JOIN shingled sa ON sa.doc_id = a_id
       |  JOIN shingled sb ON sb.doc_id = b_id
       |)
       |SELECT a_id, b_id, n_common, n_a, n_b,
       |  CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
       |FROM verified
       |WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  /** The unguarded d9 oracle — shared verbatim by d9_incremental_neardup
    * and d9_incremental_salted (the cross-screen salt-split is
    * output-invariant). */
  private val d9OracleSql =
    s"""$sigsCte, bands AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
       |), verified AS (
       |  SELECT batch_id, corpus_id,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
       |    CAST(len(sa.sh) AS BIGINT) AS n_a,
       |    CAST(len(sb.sh) AS BIGINT) AS n_b
       |  FROM cand
       |  JOIN shingled sa ON sa.doc_id = batch_id
       |  JOIN shingled sb ON sb.doc_id = corpus_id
       |)
       |SELECT batch_id, corpus_id, n_common, n_a, n_b,
       |  CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
       |FROM verified
       |WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8
       |ORDER BY batch_id, corpus_id""".stripMargin

  /** The capped-INDEX d9 oracle: the write-time cap NULLs corpus band
    * values whose posting list exceeds maxBucket = 1, so in SQL the
    * corpus side keeps only band buckets at occupancy <= 1 (exactly the
    * d14b_merge_capped gc discipline applied to d9's output shape) —
    * the batch side is uncapped, as in the stored-index screen. */
  private val d9CappedIdxOracleSql =
    s"""$sigsCte, bands AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded
       |), cbands AS (
       |  SELECT doc_id, band_idx, band_hash FROM bands WHERE doc_id % 5 <> 0
       |), ccool AS (
       |  SELECT band_idx, band_hash FROM cbands
       |  GROUP BY band_idx, band_hash HAVING COUNT(*) <= 1
       |), gc AS (
       |  SELECT b.doc_id, b.band_idx, b.band_hash
       |  FROM cbands b JOIN ccool c
       |    ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
       |  FROM bands a JOIN gc b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  WHERE a.doc_id % 5 = 0
       |), verified AS (
       |  SELECT batch_id, corpus_id,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
       |    CAST(len(sa.sh) AS BIGINT) AS n_a,
       |    CAST(len(sb.sh) AS BIGINT) AS n_b
       |  FROM cand
       |  JOIN shingled sa ON sa.doc_id = batch_id
       |  JOIN shingled sb ON sb.doc_id = corpus_id
       |)
       |SELECT batch_id, corpus_id, n_common, n_a, n_b,
       |  CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
       |FROM verified
       |WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8
       |ORDER BY batch_id, corpus_id""".stripMargin

  def oracles: Map[String, String] = {
    val base = Map(
    "d19_span_dedup" ->
      s"""WITH toked AS (
         |  SELECT doc_id, $toksSql AS lst FROM documents
         |), spans AS (
         |  SELECT doc_id,
         |    unnest(range((len(lst) + 19) // 20)) AS span_id, lst
         |  FROM toked
         |), texts AS (
         |  SELECT doc_id, span_id,
         |    array_to_string(lst[span_id * 20 + 1 : span_id * 20 + 20], ' ') AS span_text
         |  FROM spans
         |)
         |SELECT doc_id, span_id, n_copies FROM (
         |  SELECT doc_id, span_id,
         |    COUNT(*) OVER (PARTITION BY span_text) AS n_copies,
         |    ROW_NUMBER() OVER (PARTITION BY span_text
         |      ORDER BY doc_id, span_id) AS rn
         |  FROM texts
         |) WHERE rn = 1 ORDER BY doc_id, span_id""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d2_minhash_sigs" ->
      s"""$sigsCte
         |SELECT doc_id, sig0, sig1, sig2, sig3, band0, band1
         |FROM banded ORDER BY doc_id""".stripMargin,
    "d3_neardup_pairs" -> d3OracleSql,
    // salt-split skew treatment is output-INVARIANT by design, so the
    // salted registration is checked against the unguarded d3 oracle
    // VERBATIM — the cross-engine recall-preservation proof
    "d3_neardup_salted" -> d3OracleSql,
    // d3 with the skew guard armed at maxBucket=2: the cool CTE IS the
    // guard (occupancy filter on the band buckets before the join)
    "d3_neardup_capped" ->
      s"""$sigsCte, bands AS (
         |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
         |  UNION ALL
         |  SELECT doc_id, 1, band1 FROM banded
         |), cool AS (
         |  SELECT band_idx, band_hash FROM bands
         |  GROUP BY band_idx, band_hash HAVING COUNT(*) <= 2
         |), gbands AS (
         |  SELECT b.doc_id, b.band_idx, b.band_hash
         |  FROM bands b JOIN cool c
         |    ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM gbands a JOIN gbands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id
         |), verified AS (
         |  SELECT a_id, b_id,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
         |    CAST(len(sa.sh) AS BIGINT) AS n_a,
         |    CAST(len(sb.sh) AS BIGINT) AS n_b
         |  FROM cand
         |  JOIN shingled sa ON sa.doc_id = a_id
         |  JOIN shingled sb ON sb.doc_id = b_id
         |)
         |SELECT a_id, b_id, n_common, n_a, n_b,
         |  CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
         |FROM verified
         |WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,
    "d4_simhash" ->
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin,
    "d6_ngram_jaccard" ->
      """WITH grams AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) >= 5 THEN
        |      list_distinct(list_transform(range(1, length(text) - 3),
        |        i -> substr(text, CAST(i AS INT), 5)))
        |    ELSE [] END AS g
        |  FROM documents
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_common,
        |  CAST(len(a.g) AS BIGINT) AS n_a,
        |  CAST(len(b.g) AS BIGINT) AS n_b,
        |  CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0 THEN
        |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
        |      CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE)
        |  ELSE 0.0 END AS jaccard
        |FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 10 = 0
        |ORDER BY a_id""".stripMargin,
    "d5_simhash_pairs" ->
      s"""$simhashCte
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY a_id, b_id""".stripMargin,
    // transitive closure of the d3 pair graph via a recursive CTE;
    // cluster id = min reachable doc id (including self)
    "d7_dup_clusters" -> d7OracleSql,
    // the incremental merge is connectivity-preserving by construction
    // (star forest ∪ new pairs ≡ old pairs ∪ new pairs), so the
    // incremental registration is checked against the from-scratch d7
    // oracle VERBATIM on the combined corpus
    "d14_incremental_clusters" -> d7OracleSql,
    // survivors = docs that are not a non-canonical cluster member;
    // canonical members carry their cluster size as n_merged
    "d8_dedup_apply" ->
      s"""${survCte()}
         |SELECT doc_id, n_merged FROM surv ORDER BY doc_id""".stripMargin,
    // batch (doc_id % 5 = 0) vs corpus (the rest): band collision then
    // exact Jaccard — signatures are per-doc projections, so computing
    // them over all docs and filtering sides afterwards is equivalent
    // to the Spark side's separate batch/index pipelines
    "d9_incremental_neardup" -> d9OracleSql,
    // the cross-screen salt-split is output-INVARIANT by design, so the
    // salted registration is checked against the unguarded d9 oracle
    // VERBATIM — the cross-engine recall-preservation proof for the
    // batch-vs-index screen (the d3_neardup_salted precedent)
    "d9_incremental_salted" -> d9OracleSql,
    "d9_incremental_capidx" -> d9CappedIdxOracleSql,
    // d8's survivor frame with d10's argmax representative: keep the
    // highest-quality member per cluster, pass unclustered docs through
    "d13_dedup_apply_best" ->
      s"""$bestCte
         |SELECT d.doc_id, CAST(COALESCE(b.n_members, 1) AS BIGINT) AS n_merged
         |FROM documents d
         |LEFT JOIN labels l ON l.doc_id = d.doc_id
         |LEFT JOIN best b ON b.best_id = d.doc_id
         |WHERE l.doc_id IS NULL OR b.best_id IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,
    // per-cluster argmax by the shared quality SQL (one copy —
    // AnalysisQueries.qualitySql); ties (identical dup texts) break to
    // the smaller doc_id on both engines
    "d10_cluster_best" ->
      s"""$bestCte
         |SELECT cluster_id, best_id, best_quality, n_members FROM best
         |ORDER BY cluster_id""".stripMargin,
    // d3's candidate machinery, containment verify: |A∩B| / min(|A|,|B|)
    "d11_containment" ->
      s"""$sigsCte, bands AS (
         |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
         |  UNION ALL
         |  SELECT doc_id, 1, band1 FROM banded
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id
         |), verified AS (
         |  SELECT a_id, b_id,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
         |    CAST(len(sa.sh) AS BIGINT) AS n_a,
         |    CAST(len(sb.sh) AS BIGINT) AS n_b
         |  FROM cand
         |  JOIN shingled sa ON sa.doc_id = a_id
         |  JOIN shingled sb ON sb.doc_id = b_id
         |)
         |SELECT * FROM (
         |  SELECT a_id, b_id, n_common, n_a, n_b,
         |    CASE WHEN least(n_a, n_b) > 0 THEN
         |      CAST(n_common AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
         |    ELSE 0.0 END AS containment
         |  FROM verified
         |) WHERE containment >= 0.9 ORDER BY a_id, b_id""".stripMargin,
    // prefix-filtered complete-recall containment: rarity-ordered
    // prefixes (int64 ceil) probed against the full inverted index,
    // then the same exact verify as d11
    "d12_containment_join" -> containmentOracleSql("documents"),
    "d12_containment_slice" -> containmentOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 2 = 0) d"),
    // winnowing (k=4, w=4, minShared=2): selection = per-doc window min
    // of md5(kgram) || zero-padded pos (leftmost-min tie-break — both
    // engines compare the concatenated string identically); trailing
    // windows clamp, mirroring Spark's rowsBetween frame. The pair join
    // matches on the k-gram TEXT (h is only the equi key).
    "d15_winnow_spans" -> winnowSpansSql(maxBucket = 0),
    // the armed variant: SkewGuard.capBuckets on the fingerprint hash
    // mirrored as a HAVING on the posting-list occupancy
    "d15_winnow_capped" -> winnowSpansSql(maxBucket = 2),
    // extents: anchors -> per-(pair, diagonal) gaps-and-islands merge
    // (LAG + running-sum windows, gap <= w = 4) -> slice-verified
    // literal token runs; minLen = 7 = k + w - 1
    "d16_winnow_extents" ->
      s"""$winnowFpCte, anch AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS a_pos,
         |    b.pos AS b_pos, b.pos - a.pos AS diag
         |  FROM fp a JOIN fp b
         |    ON a.h = b.h AND a.kgram = b.kgram AND a.doc_id < b.doc_id
         |), lagged AS (
         |  SELECT *, LAG(a_pos) OVER (PARTITION BY a_id, b_id, diag
         |    ORDER BY a_pos) AS prev
         |  FROM anch
         |), isl AS (
         |  SELECT *, SUM(CASE WHEN prev IS NULL OR a_pos - prev > 4
         |      THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY a_id, b_id, diag ORDER BY a_pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM lagged
         |), ext AS (
         |  SELECT a_id, b_id, diag, island,
         |    MIN(a_pos) AS a_start, MAX(a_pos) + 3 AS a_end,
         |    CAST(COUNT(*) AS BIGINT) AS n_anchors
         |  FROM isl GROUP BY 1, 2, 3, 4
         |), spans AS (
         |  SELECT a_id, b_id, a_start, a_end, a_start + diag AS b_start,
         |    a_end + diag AS b_end, a_end - a_start + 1 AS span_len, n_anchors
         |  FROM ext WHERE a_end - a_start + 1 >= 7
         |)
         |SELECT s.a_id, s.b_id, s.a_start, s.a_end, s.b_start, s.b_end,
         |  s.span_len, s.n_anchors
         |FROM spans s
         |JOIN toks ta ON ta.doc_id = s.a_id
         |JOIN toks tb ON tb.doc_id = s.b_id
         |WHERE list_slice(ta.t, s.a_start, s.a_end) =
         |      list_slice(tb.t, s.b_start, s.b_end)
         |ORDER BY a_id, b_id, a_start, b_start""".stripMargin,
    // cross-source dedup: d7's clusters, representative = the member
    // whose (source-priority, doc_id) is minimal; the priority registry
    // is the alphabetical rank of distinct sources, rebuilt here so the
    // keep decision is hash-checked end-to-end
    "d18_cross_source_dedup" ->
      s"""$ccCte, labels AS (
         |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |  FROM reach GROUP BY src
         |), prio AS (
         |  SELECT source,
         |    CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS prio
         |  FROM (SELECT DISTINCT source FROM documents)
         |), mem AS (
         |  SELECT l.cluster_id, d.doc_id, d.source, p.prio
         |  FROM labels l JOIN documents d ON d.doc_id = l.doc_id
         |  JOIN prio p ON p.source = d.source
         |), r AS (
         |  SELECT cluster_id, doc_id AS keep_id, source AS keep_source,
         |    prio AS keep_prio,
         |    CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         |      AS n_members,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |                       ORDER BY prio, doc_id) AS rn
         |  FROM mem
         |)
         |SELECT cluster_id, keep_id, keep_source, keep_prio, n_members
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    // LSH recall/precision audit on the doc_id % 2 slice: truth = pairs
    // sharing >= 1 shingle (complete for J > 0) filtered to exact
    // Jaccard >= 0.8; candidates = the d3 banding, mirrored from
    // sigsCte but rebased onto the slice; found = truth ∩ candidates.
    // Ratios guarded to 1.0 on empty denominators, matching the Spark
    // side bit-for-bit (same small-int IEEE divisions both engines).
    "d17_lsh_recall_audit" ->
      s"""WITH sliced AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
         |), shingled AS (
         |  SELECT doc_id, $shSql AS sh FROM sliced
         |), sigs AS (
         |  SELECT doc_id, ${sigSql(0)} AS sig0, ${sigSql(1)} AS sig1,
         |         ${sigSql(2)} AS sig2, ${sigSql(3)} AS sig3
         |  FROM shingled
         |), banded AS (
         |  SELECT doc_id, md5(sig0 || sig1) AS band0, md5(sig2 || sig3) AS band1
         |  FROM sigs
         |), bands AS (
         |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
         |  UNION ALL
         |  SELECT doc_id, 1, band1 FROM banded
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id
         |), ex AS (
         |  SELECT doc_id, unnest(sh) AS s FROM shingled
         |), overlap AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |), truth AS (
         |  SELECT a_id, b_id FROM overlap
         |  JOIN shingled sa ON sa.doc_id = a_id
         |  JOIN shingled sb ON sb.doc_id = b_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |    CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
         |         AS DOUBLE) >= 0.8
         |), found AS (
         |  SELECT t.a_id, t.b_id FROM truth t
         |  JOIN cand c ON t.a_id = c.a_id AND t.b_id = c.b_id
         |), agg AS (
         |  SELECT
         |    (SELECT COUNT(*) FROM shingled) AS n_docs,
         |    (SELECT COUNT(*) FROM truth) AS n_true,
         |    (SELECT COUNT(*) FROM cand) AS n_candidates,
         |    (SELECT COUNT(*) FROM found) AS n_found
         |)
         |SELECT n_docs, n_true, n_candidates, n_found,
         |  CASE WHEN n_true > 0
         |    THEN CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE)
         |    ELSE 1.0 END AS recall,
         |  CASE WHEN n_candidates > 0
         |    THEN CAST(n_found AS DOUBLE) / CAST(n_candidates AS DOUBLE)
         |    ELSE 1.0 END AS precision
         |FROM agg""".stripMargin
    )
    // the b-form consumers share their parents' oracles VERBATIM: the
    // precomputed cluster fixture is a deterministic function of the
    // corpus, so applying it must reproduce the self-contained query's
    // answer bit-for-bit (the d9_incremental_salted precedent)
    base ++ Map(
      "d8b_dedup_apply_pre"   -> base("d8_dedup_apply"),
      "d13b_apply_best_pre"   -> base("d13_dedup_apply_best"),
      "d18b_cross_source_pre" -> base("d18_cross_source_dedup"),
      "d10b_cluster_best_pre" -> base("d10_cluster_best"),
      // the merge over STANDING labels (idx-labels fixture) is
      // connectivity-preserving exactly as d14's inline form, so the
      // b-form is checked against the same from-scratch d7 oracle
      "d14b_merge_pre"        -> base("d14_incremental_clusters"),
      // the salt-split is output-invariant on BOTH screens, so the
      // armed form shares the same oracle — the cross-engine recall
      // proof for the merge's ingest side
      "d14b_merge_salted"     -> base("d14_incremental_clusters"),
      // the DROP-capped merge changes the pair set, so its oracle
      // mirrors both caps in SQL (the d3_neardup_capped discipline):
      // corpus pairs unguarded, batch-internal pairs from sub-cap
      // BATCH buckets only, cross pairs from sub-cap CORPUS posting
      // lists only, then the same recursive-CTE clustering
      "d14b_merge_capped"     -> d14bCappedOracleSql,
      // the STREAMING maintainer's per-batch body is the same
      // connectivity-preserving merge over the standing labels, so the
      // streaming path shares the from-scratch d7 oracle verbatim too
      "d14c_merge_stream"     -> base("d14_incremental_clusters"),
      // the delta-publish twin reconstructs the identical labeling from
      // base + delta=<batchId> (merge-on-read), so it too shares the
      // from-scratch d7 oracle — the cross-engine proof that the
      // O(batch) publish loses nothing
      "d14d_merge_stream_mor" -> base("d14_incremental_clusters"),
      // the delta CONTENT itself: combined-corpus labels minus the
      // corpus-side seed labels (full-row anti-join) == the changed
      // rows the trigger's delta dir stores
      "d14e_merge_changefeed" -> changeFeedOracleSql)
  }

  /** The capped-merge oracle: CC over (unguarded corpus pairs ∪
    * bucket-capped batch-internal pairs ∪ posting-list-capped cross
    * pairs) — the exact graph [[incrementalClustersCapped]] folds into
    * the standing labels. Both caps mirror maxBucket = 1: a batch band
    * bucket participates in the internal self-join only while its
    * BATCH occupancy is <= 1, and a corpus band bucket accepts cross
    * probes only while its CORPUS occupancy is <= 1 (the cross screen's
    * batch side is uncapped, exactly like incrementalNeardup's "drop"
    * arm). The verify/und/reach tail is [[ccTailSql]], shared with
    * ccCte so the two oracles can never drift. */
  private val d14bCappedOracleSql =
    s"""${sigsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, bands AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded
       |), cbands AS (
       |  SELECT doc_id, band_idx, band_hash FROM bands WHERE doc_id % 5 <> 0
       |), bbands AS (
       |  SELECT doc_id, band_idx, band_hash FROM bands WHERE doc_id % 5 = 0
       |), corpus_cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM cbands a JOIN cbands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |), bcool AS (
       |  SELECT band_idx, band_hash FROM bbands
       |  GROUP BY band_idx, band_hash HAVING COUNT(*) <= 1
       |), gb AS (
       |  SELECT b.doc_id, b.band_idx, b.band_hash
       |  FROM bbands b JOIN bcool c
       |    ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
       |), batch_cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM gb a JOIN gb b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |), ccool AS (
       |  SELECT band_idx, band_hash FROM cbands
       |  GROUP BY band_idx, band_hash HAVING COUNT(*) <= 1
       |), gc AS (
       |  SELECT b.doc_id, b.band_idx, b.band_hash
       |  FROM cbands b JOIN ccool c
       |    ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
       |), cross_cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bbands a JOIN gc b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |), cand AS (
       |  SELECT a_id, b_id FROM corpus_cand
       |  UNION
       |  SELECT a_id, b_id FROM batch_cand
       |  UNION
       |  SELECT a_id, b_id FROM cross_cand
       |)$ccTailSql
       |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** The shared toks -> kg -> winnowed-selection -> fp CTE chain of the
    * d15/d16 oracles (k = 4, w = 4, unguarded). */
  private val winnowFpCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $toksSql AS t FROM documents
       |), kg AS (
       |  SELECT doc_id, u.pos AS pos, u.kgram AS kgram, md5(u.kgram) AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 1)),
       |      i -> struct_pack(pos := i,
       |        kgram := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS u
       |    FROM toks)
       |), sel AS (
       |  SELECT DISTINCT doc_id,
       |    min(h || lpad(CAST(pos AS VARCHAR), 10, '0'))
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey
       |  FROM kg
       |), dec AS (
       |  SELECT doc_id, substr(selkey, 1, 32) AS h,
       |    CAST(substr(selkey, 33, 10) AS BIGINT) AS pos
       |  FROM sel
       |), fp AS (
       |  SELECT d.doc_id, d.pos, k.kgram, d.h
       |  FROM dec d JOIN kg k ON k.doc_id = d.doc_id AND k.pos = d.pos
       |)""".stripMargin

  /** The d15 oracle, parameterized by the fingerprint df-cap (0 = the
    * unguarded join). */
  private def winnowSpansSql(maxBucket: Int): String = {
    val fpSrc =
      if (maxBucket <= 0) "fp"
      else s"""(SELECT f.* FROM fp f JOIN (
              |    SELECT h AS ch FROM fp GROUP BY h HAVING COUNT(*) <= $maxBucket
              |  ) cool ON f.h = cool.ch)""".stripMargin
    s"""$winnowFpCte
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(COUNT(*) AS BIGINT) AS shared_fps,
       |  MIN(a.pos) AS first_a_pos, MIN(b.pos) AS first_b_pos
       |FROM $fpSrc a JOIN $fpSrc b
       |  ON a.h = b.h AND a.kgram = b.kgram AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** The d12 oracle parameterized by the source relation, so the raw
    * and sliced registrations share one SQL body (the slice relation
    * re-derives df/prefixes from its own corpus, mirroring Spark). */
  private def containmentOracleSql(docsRel: String): String =
      s"""WITH shingled AS (
         |  SELECT doc_id, $shSql AS sh FROM $docsRel
         |), ex AS (
         |  SELECT doc_id, unnest(sh) AS s FROM shingled
         |), dfreq AS (
         |  SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY s
         |), ranked AS (
         |  SELECT e.doc_id, e.s,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY e.doc_id
         |                            ORDER BY d.df, e.s) AS BIGINT) AS rn
         |  FROM ex e JOIN dfreq d ON d.s = e.s
         |), sizes AS (
         |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shingled
         |), prefix AS (
         |  SELECT r.doc_id AS p_id, r.s
         |  FROM ranked r JOIN sizes z ON z.doc_id = r.doc_id
         |  WHERE r.rn <= z.n - (z.n * 9 + 9) // 10 + 1
         |), cand AS (
         |  SELECT DISTINCT least(p.p_id, e.doc_id) AS a_id,
         |                  greatest(p.p_id, e.doc_id) AS b_id
         |  FROM prefix p JOIN ex e ON e.s = p.s AND e.doc_id <> p.p_id
         |), verified AS (
         |  SELECT a_id, b_id,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
         |    CAST(len(sa.sh) AS BIGINT) AS n_a,
         |    CAST(len(sb.sh) AS BIGINT) AS n_b
         |  FROM cand
         |  JOIN shingled sa ON sa.doc_id = a_id
         |  JOIN shingled sb ON sb.doc_id = b_id
         |)
         |SELECT * FROM (
         |  SELECT a_id, b_id, n_common, n_a, n_b,
         |    CASE WHEN least(n_a, n_b) > 0 THEN
         |      CAST(n_common AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
         |    ELSE 0.0 END AS containment
         |  FROM verified
         |) WHERE containment >= 0.9 ORDER BY a_id, b_id""".stripMargin

  /** Near-dup SURVIVORS as a CTE — the d8 semantics (one canonical doc
    * per cluster, n_merged = docs it represents) in exactly one place,
    * shared by the d8 oracle and AnalysisQueries' end-to-end curation
    * oracle. `extraCols` injects additional select-list columns over
    * `documents d` (e.g. a token count) without duplicating the
    * survivor join. */
  private[queries] def survCte(extraCols: String = ""): String =
    s"""$ccCte, labels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |), sizes AS (
       |  SELECT cluster_id, COUNT(*) AS n_merged FROM labels
       |  GROUP BY cluster_id
       |), surv AS (
       |  SELECT d.doc_id, COALESCE(s.n_merged, 1) AS n_merged$extraCols
       |  FROM documents d
       |  LEFT JOIN labels l ON l.doc_id = d.doc_id AND l.doc_id <> l.cluster_id
       |  LEFT JOIN sizes s ON s.cluster_id = d.doc_id
       |  WHERE l.doc_id IS NULL
       |)""".stripMargin

  /** Cluster labels + member quality + per-cluster argmax as a CTE
    * chain ending in `best(cluster_id, best_id, best_quality,
    * n_members)` (with `labels` still in scope) — the ONE SQL-side
    * definition of "the representative to keep", shared by the d10 and
    * d13 oracles; quality itself is AnalysisQueries.qualitySql. */
  private[queries] def bestCte: String =
    s"""$ccCte, labels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |), qual AS (
       |  SELECT l.cluster_id, d.doc_id,
       |    ${AnalysisQueries.qualitySql} AS quality
       |  FROM documents d JOIN labels l ON l.doc_id = d.doc_id
       |), best AS (
       |  SELECT cluster_id, best_id, best_quality, n_members FROM (
       |    SELECT cluster_id, doc_id AS best_id, quality AS best_quality,
       |      COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
       |      ROW_NUMBER() OVER (PARTITION BY cluster_id
       |                         ORDER BY quality DESC, doc_id ASC) AS rn
       |    FROM qual
       |  ) WHERE rn = 1
       |)""".stripMargin

  /** The SEED-side clustering chain for the change-feed oracle: the
    * d7 pipeline restricted to the corpus side (doc_id % 5 <> 0 — the
    * docs the standing index/labels fixture was built from), every CTE
    * suffixed `_s` so it composes after [[ccCte]] under the same WITH
    * RECURSIVE. Ends in `seedlabels(doc_id, cluster_id)`. Text mirrors
    * [[ccCte]]/[[ccTailSql]] exactly but cannot share them verbatim
    * (those are anchored on the unfiltered `documents` and unsuffixed
    * names); the MergeClustersSpec/d14 family already pins that the
    * fixture's labels equal this restricted from-scratch clustering. */
  private def seedLabelsCtes: String =
    s""", shingled_s AS (
       |  SELECT doc_id, $shSql AS sh FROM documents WHERE doc_id % 5 <> 0
       |), sigs_s AS (
       |  SELECT doc_id, ${sigSql(0)} AS sig0, ${sigSql(1)} AS sig1,
       |         ${sigSql(2)} AS sig2, ${sigSql(3)} AS sig3
       |  FROM shingled_s
       |), banded_s AS (
       |  SELECT doc_id, md5(sig0 || sig1) AS band0, md5(sig2 || sig3) AS band1
       |  FROM sigs_s
       |), bands_s AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded_s
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded_s
       |), cand_s AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands_s a JOIN bands_s b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |), pairs_s AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a_id, b_id,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS n_common,
       |      CAST(len(sa.sh) AS DOUBLE) AS n_a,
       |      CAST(len(sb.sh) AS DOUBLE) AS n_b
       |    FROM cand_s
       |    JOIN shingled_s sa ON sa.doc_id = a_id
       |    JOIN shingled_s sb ON sb.doc_id = b_id
       |  ) WHERE n_common / (n_a + n_b - n_common) >= 0.8
       |), und_s AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs_s
       |  UNION
       |  SELECT b_id, a_id FROM pairs_s
       |), reach_s(src, dst) AS (
       |  SELECT src, dst FROM und_s
       |  UNION
       |  SELECT r.src, u.dst FROM reach_s r JOIN und_s u ON r.dst = u.src
       |), seedlabels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach_s GROUP BY src
       |)""".stripMargin

  /** The change-feed oracle: final combined-corpus labels MINUS the
    * seed (corpus-side) labels, matched on the full (doc_id,
    * cluster_id) row — exactly the rows the batch merge created or
    * moved, which is exactly what the delta dir stores. */
  private[queries] def changeFeedOracleSql: String =
    s"""$ccCte, labels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |)$seedLabelsCtes
       |SELECT l.doc_id, l.cluster_id FROM labels l
       |LEFT JOIN seedlabels s
       |  ON s.doc_id = l.doc_id AND s.cluster_id = l.cluster_id
       |WHERE s.doc_id IS NULL
       |ORDER BY l.doc_id""".stripMargin

  /** Shared prefix of d7/d8 (and AnalysisQueries' end-to-end curation
    * oracle): LSH candidates -> Jaccard verify -> undirected edge set ->
    * recursive reachability. */
  private[queries] def ccCte: String =
    s"""${sigsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, bands AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
       |  UNION ALL
       |  SELECT doc_id, 1, band1 FROM banded
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |)$ccTailSql""".stripMargin

  /** The verify → undirected-edge → recursive-reachability tail over a
    * `cand(a_id, b_id)` CTE (exact Jaccard >= 0.8 against `shingled`,
    * then min-reachable clustering input) — ONE copy shared by [[ccCte]]
    * and the capped-merge oracle, so the verify expression and the CC
    * recursion can never drift between them. */
  private def ccTailSql: String =
    s""", pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a_id, b_id,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS n_common,
       |      CAST(len(sa.sh) AS DOUBLE) AS n_a,
       |      CAST(len(sb.sh) AS DOUBLE) AS n_b
       |    FROM cand
       |    JOIN shingled sa ON sa.doc_id = a_id
       |    JOIN shingled sb ON sb.doc_id = b_id
       |  ) WHERE n_common / (n_a + n_b - n_common) >= 0.8
       |), und AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION
       |  SELECT b_id, a_id FROM pairs
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM und
       |  UNION
       |  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
       |)""".stripMargin
}
