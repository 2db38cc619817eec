package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ext.{TextAnalysis => TA}
import AnalysisQueries.{toks, toksSql}

/** Data-SELECTION tier: the step after cleaning/dedup where a training
  * corpus is chosen from the pool — domain-targeted importance weighting
  * (DSIR, Xie et al. NeurIPS'23), perplexity bucketing (CCNet, Wenzek et
  * al. LREC'20), per-source quality top-p%, and fixed token budgets.
  * Everything follows the repo's cross-engine determinism rules: hashes
  * are md5-derived, doubles appear only after exact integer/decimal
  * arithmetic, and every ordering has a total tie-break.
  *
  * Scale notes:
  *  - Importance weights reduce to per-doc hashed-feature counts joined
  *    against an m-sized (m = 4096) broadcast feature table — the corpus
  *    is scanned once, and no shuffle carries more than the per-doc
  *    bucket counts (≤ m rows per doc, in practice ~tokens).
  *  - The two windowed selectors partition by source/lang: each
  *    partition sorts locally. Small group cardinality (languages,
  *    crawl dumps) is the production shape CCNet/FineWeb use — if a
  *    single group outgrows an executor, the threshold variant (compute
  *    the cutoff score per group, broadcast, filter) replaces the
  *    window with one agg + one scan; same contract, no global sort.
  */
object SelectionQueries extends QueryGroup {

  /** Hashed feature space size for importance weighting. DSIR uses 10k
    * buckets for 400M docs; the rule is m ≫ distinct-feature collision
    * tolerance while the weight table stays broadcastable — at 100 TB,
    * m = 1e5–1e6 is still a few MB. */
  val dsirBuckets: Int = graft.ext.Selection.defaultBuckets

  /** DSIR-style importance weights: how much more likely is each doc's
    * hashed n-gram profile under the TARGET distribution (here: the
    * corpus's English slice stands in for the high-quality target
    * domain) than under the RAW pool. Features are unigrams + bigrams
    * hashed into [[dsirBuckets]] buckets; per-feature probabilities are
    * add-one smoothed. The published method scores docs with
    * Σ c_f·log(p_t(f)/p_r(f)); transcendental functions round
    * differently across engines (a 1-ulp log error flips a 1e-12
    * quantization boundary), so the registered form uses the repo's
    * rational-arithmetic idiom: the per-feature probability RATIO is
    * quantized to an integer at 1e9 and the doc score is the
    * c-weighted MEAN ratio — same signal (monotone in the target
    * affinity per feature), exact cross-engine.
    *
    * Plan shape: one documents scan → explode unigrams+bigrams → hash
    * agg to per-doc bucket counts (map-side combined); the feature
    * table (≤ m rows) and the 1-row totals broadcast back. The only
    * corpus-sized shuffle is the per-doc count agg. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val S = graft.ext.Selection
    // the per-doc count frame feeds the weight aggregation AND the
    // scoring join — ONE corpus scan/explode, persisted for the reuse
    val db = graft.core.CacheScope.track(
      S.featureCounts(Tables(spark, dir).documents, dsirBuckets,
        extra = Seq("lang")).persist())
    S.scoreFromCounts(db,
      S.weightTableFromCounts(db, col("lang") === "en", dsirBuckets))
  }

  /** The ingest form of x_dsir_weights: weights TRAINED once on the
    * standing corpus (doc_id % 5 ≠ 0) and committed through the
    * IndexStore, then a new batch (doc_id % 5 = 0) scored against the
    * committed table — two reads of an m-row parquet plus one pass over
    * the batch; the corpus is never rescanned (the d9/y7 ingest
    * pattern). Features the corpus never saw don't vote (inner-join
    * semantics, mirrored in the oracle). */
  def dsirIncremental(spark: SparkSession, dir: String): DataFrame = {
    val S = graft.ext.Selection
    val docs = Tables(spark, dir).documents
    val idx = graft.core.IndexStore.ensure(spark, dsirIndexPathFor(spark, dir)) {
      scratch => S.writeWeightIndex(docs.filter(col("doc_id") % 5 =!= 0),
        col("lang") === "en", scratch, dsirBuckets)
    }
    S.scoreAgainstIndex(spark, docs.filter(col("doc_id") % 5 === 0), idx,
      dsirBuckets)
  }

  private def dsirIndexPathFor(spark: SparkSession, dir: String): String =
    graft.core.IndexStore.pathFor(spark, "dsir-index", dir)

  /** CCNet-style perplexity bucketing: rank every doc within its
    * language by the bigram LM score (x_lm_score's exact pipeline) and
    * split each language into head/middle/tail terciles — the corpus
    * card CCNet publishes and the filter most LLM pipelines apply
    * ("train on head+middle"). ntile over (lang) with a doc_id
    * tie-break is deterministic because the scores themselves are
    * engine-identical (integer-quantized probabilities). */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val lm = AnalysisQueries.lmScore(spark, dir)
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("lang"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lm_score").desc, col("doc_id"))
    lm.join(docs, "doc_id")
      .withColumn("__nt", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("__nt") === 1, lit("head"))
          .when(col("__nt") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-source quality top-p%: keep the best 30% of each source by the
    * engine's canonical quality score (the d10/curation qualitySql
    * product) — the FineWeb-style per-dump selection step. The keep
    * predicate is pure integer arithmetic (10·rank ≤ 3·n) so the
    * fraction never touches float rounding. */
  def qualityTopP(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"), toks.as("__toks"))
      .select(col("doc_id"), col("source"),
        size(col("__toks")).cast("long").as("__n"),
        TA.stopwordRatio(col("__toks")).as("__sr"),
        TA.punctRatio(col("text")).as("__pr"))
      .select(col("doc_id"), col("source"),
        TA.qualityFromStaged(col("__n"), col("__sr"), col("__pr"))
          .as("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n_src", count(lit(1)).over(
        Window.partitionBy(col("source"))))
      .filter(lit(10L) * col("__rn") <= lit(3L) * col("__n_src"))
      .select(col("doc_id"), col("source"), col("quality"))
  }

  /** Fixed token budget per source: a deterministic, seeded-shuffle
    * prefix of each source worth `budget` tokens — "give me 500 tokens
    * of every source" (epoch construction / pilot corpora). Order is
    * the same run-stable md5 key as x_pack_shuffled, so re-runs and
    * resumes select the identical prefix; a doc is kept iff it STARTS
    * inside the budget (the first doc of a source always survives). */
  def tokenBudget(spark: SparkSession, dir: String,
                  budget: Long = 500L): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("__ord"), col("doc_id"))
    Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("__ord",
        md5(concat(lit("tb_"), col("doc_id").cast("string"))))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") - col("n_tok") < lit(budget))
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum"))
  }

  /** Leakage-proof train/val/test split: assignment is a pure
    * function of the NEAR-DUP CLUSTER id (the d7 connectivity labels;
    * singletons are their own cluster), so two near-duplicate
    * documents can never land in different splits — the eval-set
    * contamination a doc-id-hashed split silently commits whenever a
    * near-dup pair straddles the cut. Split by the same run-stable
    * md5 bucket as x_hash_sample (engine-reproducible, seedless,
    * stable under corpus growth: a cluster's split never changes as
    * other clusters arrive — an append can only shift assignments by
    * MERGING clusters, which is exactly when a reassignment is
    * semantically required). 80/10/10 at the bucket level; realized
    * fractions are cluster-size-weighted, spec-pinned within
    * tolerance. */
  def splitByCluster(spark: SparkSession, dir: String): DataFrame = {
    val clusters = DedupQueries.dupClusters(spark, dir)
    val bucket = expr(graft.ext.Dedup.hexValSql(
      "substr(md5(cast(cluster_id as string)),1,8)", 8)) % 100
    Tables(spark, dir).documents.select(col("doc_id"))
      .join(clusters.withColumnRenamed("cluster_id", "__c"),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__c"), col("doc_id")))
      .drop("__c")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_split_leakproof" -> (splitByCluster _),
    "x_dsir_weights" -> (dsirWeights _),
    "x_dsir_incremental" -> (dsirIncremental _),
    "x_ppl_buckets" -> (pplBuckets _),
    "x_quality_topp" -> (qualityTopP _),
    "x_token_budget" -> ((s: SparkSession, d: String) => tokenBudget(s, d))
  )

  /** The one SQL-side definition of the DSIR pipeline: feature counts
    * over ALL docs, weights from the `corpusPred` slice, scores for the
    * `scorePred` slice (both predicates over db rows / d rows). The
    * full registration uses TRUE/TRUE; the incremental one trains on
    * doc_id % 5 ≠ 0 and scores doc_id % 5 = 0 — same arithmetic, so
    * the committed-index path is hash-checked against a from-scratch
    * SQL derivation. */
  private def dsirOracleSql(corpusPred: String, scorePred: String): String = {
    val hv = graft.ext.Dedup.hex4ValSql("substr(md5(f),1,4)")
    val m = dsirBuckets
    s"""WITH t AS (
       |  SELECT doc_id, lang, $toksSql AS toks FROM documents
       |), feats AS (
       |  SELECT doc_id, lang, unnest(toks) AS f FROM t
       |  UNION ALL
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS f FROM t
       |), db AS (
       |  SELECT doc_id, lang, ($hv) % $m AS b,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM feats GROUP BY 1, 2, 3
       |), cr AS (
       |  SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM db
       |  WHERE $corpusPred GROUP BY 1
       |), ct AS (
       |  SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM db
       |  WHERE lang = 'en' AND $corpusPred GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS nr,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS nt
       |  FROM db WHERE $corpusPred
       |), q AS (
       |  SELECT cr.b,
       |    CAST(floor(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
       |      * CAST(tot.nr + $m AS DOUBLE)
       |      / (CAST(cr.cr + 1 AS DOUBLE) * CAST(tot.nt + $m AS DOUBLE))
       |      * 1000000000.0 + 0.5) AS BIGINT) AS qf
       |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
       |)
       |SELECT d.doc_id, CAST(SUM(d.c) AS BIGINT) AS n_feats,
       |  CAST(CAST(SUM(d.c * q.qf) AS BIGINT) AS DOUBLE)
       |    / (CAST(CAST(SUM(d.c) AS BIGINT) AS DOUBLE) * 1000000000.0)
       |    AS dsir_score
       |FROM db d JOIN q ON d.b = q.b
       |WHERE $scorePred
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "x_split_leakproof" ->
      s"""${DedupQueries.ccCte}, labels AS (
         |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |  FROM reach GROUP BY src
         |), assigned AS (
         |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
         |), bucketed AS (
         |  SELECT doc_id, cluster_id,
         |    ${graft.ext.Dedup.hexValSql(
                "substr(md5(CAST(cluster_id AS VARCHAR)),1,8)", 8)} % 100 AS b
         |  FROM assigned
         |)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 80 THEN 'train'
         |       WHEN b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM bucketed ORDER BY doc_id""".stripMargin,
    "x_dsir_weights" -> dsirOracleSql("TRUE", "TRUE"),
    "x_dsir_incremental" ->
      dsirOracleSql("doc_id % 5 <> 0", "d.doc_id % 5 = 0"),
    "x_ppl_buckets" ->
      s"""${AnalysisQueries.lmCte}, ranked AS (
         |  SELECT l.doc_id, d.lang, l.lm_score,
         |    ntile(3) OVER (PARTITION BY d.lang
         |                   ORDER BY l.lm_score DESC, l.doc_id) AS nt
         |  FROM lmq l JOIN documents d ON d.doc_id = l.doc_id
         |)
         |SELECT doc_id, lang, lm_score,
         |  CASE WHEN nt = 1 THEN 'head' WHEN nt = 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM ranked ORDER BY doc_id""".stripMargin,
    "x_quality_topp" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source, ${AnalysisQueries.qualitySql} AS quality
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, source, quality,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n_src
         |  FROM scored
         |)
         |SELECT doc_id, source, quality FROM r
         |WHERE 10 * rn <= 3 * n_src ORDER BY doc_id""".stripMargin,
    "x_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tok,
         |    md5('tb_' || CAST(doc_id AS VARCHAR)) AS ordk
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY ordk, doc_id)
         |      AS BIGINT) AS cum
         |  FROM t
         |)
         |SELECT doc_id, source, n_tok, cum FROM c
         |WHERE cum - n_tok < 500 ORDER BY doc_id""".stripMargin
  )
}
