package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 (and the
  * extended large-scale pipeline surface) is exposed as a named query over
  * the testdata tables, with a DuckDB oracle where the semantics are
  * SQL-expressible. Streaming-only semantics (MemoryStream goldens,
  * watermark cadence) are covered by ScalaTest specs instead.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    TextQueries,
    EventQueries,
    StatefulQueries,
    AnalysisQueries,
    DedupQueries,
    SimilarityQueries,
    SelectionQueries,
    LayoutQueries,
    QualityQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.defs).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_.oracles).reduce(_ ++ _)

  /** Build the on-disk fixtures some registered queries READ (the
    * t6/t7/t8 upsert tables) so harnesses can pay the build outside
    * any measured window. Idempotent per (JVM, sf dir); a query called
    * cold still builds its own fixture on first touch. */
  def prepareFixtures(spark: SparkSession, sfDir: String): Unit =
    prepareFixturesFor(spark, sfDir, fixtureReaders)

  /** Per-TIER fixture builds: each group's prepare runs only when one
    * of ITS readers is wanted — a t6-only dev iteration must not pay
    * the dedup tier's full shingle→band→verify→CC cluster build (one
    * of the heaviest jobs in the repo), and vice versa. */
  def prepareFixturesFor(spark: SparkSession, sfDir: String,
                         wanted: Set[String]): Unit =
    fixtureTiers.foreach { case (readers, prepare) =>
      if (wanted.exists(readers)) prepare(spark, sfDir)
    }

  private val fixtureTiers: Seq[(Set[String], (SparkSession, String) => Unit)] =
    Seq(
      (Set("t6_upsert_apply", "t7_upsert_asof", "t8_upsert_changefeed"),
        StatefulQueries.prepareFixtures),
      (Set("y16_ivf_recall_clustered", "x_media_ann"),
        SimilarityQueries.prepareFixtures),
      (Set("d8b_dedup_apply_pre", "d13b_apply_best_pre",
           "d18b_cross_source_pre", "d10b_cluster_best_pre",
           "d14b_merge_pre", "d14b_merge_salted", "d14b_merge_capped",
           "d9_incremental_capidx", "d14c_merge_stream",
           "d14d_merge_stream_mor", "d14e_merge_changefeed"),
        DedupQueries.prepareFixtures))

  /** Registered queries that READ an on-disk fixture built by
    * [[prepareFixtures]]: a harness timing any of these must call
    * prepareFixtures/prepareFixturesFor first so the fixture build
    * isn't billed to the measured window (a query called cold still
    * builds its own fixture on first touch — correctness never depends
    * on the pre-build). */
  def fixtureReaders: Set[String] = fixtureTiers.flatMap(_._1).toSet

  /** Production-hash twins of the md5-priced queries: identical pipeline
    * topology with `hashMode = "xxh64"` (codegen-native 64-bit hashes —
    * no hex strings in projections or shuffles). Deliberately NOT in
    * [[queries]]: xxhash64 has no DuckDB counterpart, so correctness
    * rides on each md5 twin's oracle plus the cross-mode agreement
    * specs; Bench times these alongside the registry so the gate
    * artifact records the production numbers next to the oracle-priced
    * ones. */
  def prodVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d2_minhash_sigs_xxh64" ->
      ((s, d) => DedupQueries.minhashSigs(s, d, "xxh64")),
    "d4_simhash_xxh64" ->
      ((s, d) => DedupQueries.simhashes(s, d, "xxh64")),
    "d5_simhash_pairs_xxh64" ->
      ((s, d) => DedupQueries.simhashPairs(s, d, "xxh64")),
    "x_bloom_decontaminate_xxh64" ->
      ((s, d) => AnalysisQueries.bloomDecontaminate(s, d, "xxh64")),
    "x_quality_classifier_xxh64" ->
      ((s, d) => AnalysisQueries.qualityClassifier(s, d, "xxh64")),
    // the composable curation pipeline end-to-end in production hash
    // mode: 64-bit sigs/bands through candidate generation (not
    // output-invariant — candidate recall differs per hash — so a
    // timing twin only; the md5 form is the oracle-checked
    // x_curate_pack)
    "x_curate_pack_xxh64" ->
      ((s, d) => graft.ext.Curation.curate(
        graft.sources.Tables(s, d).documents,
        graft.ext.CurationConfig(hashMode = "xxh64"))),
    // CMS heavy hitters in production hash mode: output-INVARIANT vs
    // the md5 registration (the screen is recall-complete in either
    // family and the exact pass owns the answer — CountMinSpec asserts
    // the equality), so this is both a timing twin and a second
    // correctness witness
    "x_heavy_shingles_xxh64" ->
      ((s, d) => graft.queries.AnalysisQueries.heavyShingles(s, d, "xxh64")),
    // HLL cardinality twin: approx_count_distinct in place of the
    // exact distinct — the exchange carries fixed-size sketches, not
    // the vocabulary. Timing-only (approximate output); relative
    // error and the map-side partial are pinned by VocabSketchSpec.
    "x_vocab_by_source_hll" ->
      ((s, d) => graft.queries.AnalysisQueries.vocabBySource(s, d, exact = false)),
    // Quantile-sketch split on a CONTINUOUS domain: exact percentile's
    // agg state is distinct-value-sized (group-row-count-sized here) vs
    // the GK summary's eps-bounded state. Neither is oracle-registered
    // (sketch approximate by design; exact float interpolation not
    // expression-shape-stable cross-engine) — the rank-error contract
    // and plan shape are pinned by QuantileSketchSpec; timing both
    // keeps the exact-vs-sketch gap in the bench record.
    "q_price_quantiles_exact" ->
      ((s, d) => RelationalQueries.priceQuantiles(s, d, exact = true)),
    "q_price_quantiles_sketch" ->
      ((s, d) => RelationalQueries.priceQuantiles(s, d, exact = false)),
    // frequent-items sketch (DataSketches ItemsSketch via approx_top_k,
    // Spark 4.1): one-pass per-source top-k shingles, maxTracked-bounded
    // state. Timing twin only — tie order and estimates are not
    // hash-stable; contract spec-pinned (FrequentItemsSpec).
    "x_heavy_shingles_topk" ->
      ((s, d) => AnalysisQueries.heavyShinglesTopK(s, d)),
    // materialized mergeable HLL sketches (ext/SketchStore): sketch at
    // ingest, answer distinct-over-history by merging stored kilobyte
    // rows - no rescan. Timing twin; merge determinism + append
    // contracts spec-pinned (SketchStoreSpec).
    "x_vocab_sketch_store" ->
      ((s, d) => AnalysisQueries.vocabSketchStore(s, d))
    // (the streaming label maintainer is d14c_merge_stream in the
    // ORACLE registry — promoted from a timing twin, since its merge
    // is connectivity-preserving and shares d14's oracle verbatim)
  )
}
