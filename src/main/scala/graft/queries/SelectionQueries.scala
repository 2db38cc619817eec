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
  val dsirBuckets = 4096

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
    val m = dsirBuckets
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), toks.as("__toks"))
    // explode_outer + null-filter (not bare explode): the generate
    // filter-inlining trap would re-split the text per predicate
    val uni = base
      .select(col("doc_id"), col("lang"), explode_outer(col("__toks")).as("f"))
      .filter(col("f").isNotNull)
    // bigram string "w1 w2" cannot collide with a unigram (tokens are
    // \s+-split, so they never contain a space); concat is null-strict,
    // so zip_with's padded tail pair drops in the same filter
    val bi = base
      .select(col("doc_id"), col("lang"), explode_outer(zip_with(
        col("__toks"), slice(col("__toks"), lit(2), size(col("__toks"))),
        (x, y) => concat(x, lit(" "), y))).as("f"))
      .filter(col("f").isNotNull)
    // stage the 4-hex digest before the 4-reference hex-value extract
    // (hex4ValSql reads its input 4x; inlining would run md5 4x/row)
    val db = uni.unionByName(bi)
      .select(col("doc_id"), col("lang"),
        substring(md5(col("f")), 1, 4).as("__h"))
      .select(col("doc_id"), col("lang"),
        expr(s"(${graft.ext.Dedup.hex4ValSql("__h")}) % $m").as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
    val dbp = graft.core.CacheScope.track(db.persist())
    val cr = dbp.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val ct = dbp.filter(col("lang") === "en")
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val tot = dbp.agg(sum(col("c")).as("nr"),
      sum(when(col("lang") === "en", col("c")).otherwise(lit(0L))).as("nt"))
    val qf = floor(
      (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
        (col("nr") + lit(m.toLong)).cast("double") /
        ((col("cr") + lit(1L)).cast("double") *
          (col("nt") + lit(m.toLong)).cast("double")) *
        lit(1.0e9) + lit(0.5)).cast("long")
    val feat = cr.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"), qf.as("qf"))
    dbp.join(broadcast(feat), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        (sum(col("c") * col("qf")).cast("double") /
          (sum(col("c")).cast("double") * lit(1.0e9))).as("dsir_score"))
      .select(col("doc_id"), col("n_feats"), col("dsir_score"))
  }

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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_dsir_weights" -> (dsirWeights _),
    "x_ppl_buckets" -> (pplBuckets _),
    "x_quality_topp" -> (qualityTopP _),
    "x_token_budget" -> ((s: SparkSession, d: String) => tokenBudget(s, d))
  )

  def oracles: Map[String, String] = Map(
    "x_dsir_weights" -> {
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
         |  SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM db GROUP BY 1
         |), ct AS (
         |  SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM db
         |  WHERE lang = 'en' GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS nr,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS nt
         |  FROM db
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
         |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin
    },
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
