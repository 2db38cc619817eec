package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Importance-weighted data selection (the DSIR family, Xie et al.
  * NeurIPS'23) as a library: hashed n-gram features, a target/raw
  * probability-ratio weight table, and three scoring shapes —
  *
  *  - [[score]]: broadcast-join scoring for batch pipelines;
  *  - [[scoreProjected]]: the weight table COLLECTED into an m-sized
  *    array literal and applied as a pure projection — no join, no
  *    shuffle; the per-ingest / streaming screen shape (the Bloom
  *    decontamination precedent: the model is bounded by m, never the
  *    corpus);
  *  - [[scoreAgainstIndex]]: scoring against a weight table COMMITTED
  *    through [[graft.core.IndexStore]] — train weights once over the
  *    corpus, score every future batch without touching the corpus
  *    again (the d9/y7 ingest pattern).
  *
  * Determinism contract (the repo's oracle rules): features are
  * md5-hashed, counts and quantized ratios are exact int64, and the
  * only doubles are one division per feature-table row and one per
  * output row — identical in Spark and DuckDB. The published method's
  * log-ratio score is re-expressed as the c-weighted MEAN of the
  * 1e9-quantized probability ratio: transcendental functions round
  * differently across engines, and the mean-ratio form keeps the same
  * per-feature monotonicity in target affinity while staying exact.
  */
object Selection {

  /** Feature-space size. DSIR ships 10k buckets for a 400M-doc pool;
    * the constraint is only that the weight table broadcasts/collects
    * (m·16 bytes), so 1e5–1e6 is still nothing at 100 TB. */
  val defaultBuckets = 4096

  /** unigrams ++ bigrams of a token array. The bigram join string
    * "w1 w2" cannot collide with a unigram (tokens are \s+-split and
    * never contain a space). zip_with pads the tail pair with null and
    * concat is null-strict, so the array carries exactly one trailing
    * null for a non-empty input — consumers drop null elements. */
  def featureArray(toks: Column): Column =
    concat(toks, zip_with(toks, slice(toks, lit(2), size(toks)),
      (x, y) => concat(x, lit(" "), y)))

  /** Per-doc hashed feature-bucket counts: (doc_id, [extra...], b, c).
    * One scan of `docs`, one explode, one map-side-combined hash agg.
    * `extra` carries doc-level columns (e.g. the target label) through
    * to the count frame. */
  def featureCounts(docs: DataFrame, m: Int = defaultBuckets,
                    extra: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extra).map(col)
    docs
      .select(keep :+ split(col("text"), "\\s+").as("__toks"): _*)
      // explode_outer + null-filter, not bare explode: the generate
      // filter-inlining trap would re-split the text per predicate
      .select(keep :+ explode_outer(featureArray(col("__toks"))).as("f"): _*)
      .filter(col("f").isNotNull)
      // stage the digest, then ONE codegen'd base-16 parse (the oracle
      // keeps the portable substr/instr fold — identical values);
      // staging still keeps md5 at once per feature
      .select(keep :+ substring(md5(col("f")), 1, 4).as("__h"): _*)
      .select(keep :+
        expr(s"CAST(conv(__h, 16, 10) AS BIGINT) % $m").as("b"): _*)
      .groupBy(keep :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** The (b, qf) weight table from a per-doc count frame that carries a
    * boolean `isTarget` expression over its columns: qf = the add-one
    * smoothed P_target(b)/P_raw(b) ratio, floor-quantized at 1e9.
    * Output is ≤ m rows — broadcast-sized by construction. */
  def weightTableFromCounts(db: DataFrame, isTarget: Column,
                            m: Int = defaultBuckets): DataFrame = {
    val cr = db.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val ct = db.filter(isTarget).groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val tot = db.agg(sum(col("c")).as("nr"),
      sum(when(isTarget, col("c")).otherwise(lit(0L))).as("nt"))
    val qf = floor(
      (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
        (col("nr") + lit(m.toLong)).cast("double") /
        ((col("cr") + lit(1L)).cast("double") *
          (col("nt") + lit(m.toLong)).cast("double")) *
        lit(1.0e9) + lit(0.5)).cast("long")
    cr.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"), qf.as("qf"))
  }

  /** Weight table straight from a corpus: `isTarget` is a row predicate
    * over `docs` (e.g. lang = 'en', or a source whitelist). */
  def weightTable(docs: DataFrame, isTarget: Column,
                  m: Int = defaultBuckets): DataFrame =
    weightTableFromCounts(
      featureCounts(docs.withColumn("__t", isTarget), m, Seq("__t")),
      col("__t"), m)

  /** Score a per-doc count frame against a weight table: n_feats = the
    * doc's feature occurrences THAT HAVE a weight row (inner-join
    * semantics — features unseen at weight-training time don't vote),
    * dsir_score = the c-weighted mean quantized ratio, descaled. */
  def scoreFromCounts(db: DataFrame, weights: DataFrame): DataFrame =
    db.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        (sum(col("c") * col("qf")).cast("double") /
          (sum(col("c")).cast("double") * lit(1.0e9))).as("dsir_score"))
      .select(col("doc_id"), col("n_feats"), col("dsir_score"))

  /** Broadcast-join scoring of raw docs. */
  def score(docs: DataFrame, weights: DataFrame,
            m: Int = defaultBuckets): DataFrame =
    scoreFromCounts(featureCounts(docs, m), weights)

  /** Pure-PROJECTION scoring: the weight table collected into one
    * m-long array literal (m·8 bytes — the 4096 default is 32 KB, the
    * same budget as the Bloom filter literal) and applied per row with
    * no join, no explode, no shuffle — one codegen span per doc. The
    * shape an ingest/stream screen wants: per-batch cost is exactly one
    * pass over the batch.
    *
    * Agreement contract: output EQUALS [[score]] with the same weight
    * table (spec-asserted) — integer sums are association-free, so
    * summing per occurrence here and per bucket there is the same
    * number. Missing buckets are a 0 sentinel (excluded from both sums,
    * mirroring the join's inner semantics); a TRUE qf of 0 would need
    * P_t/P_r < 5e-10 — raise the quantization scale before any real
    * corpus gets there. Docs with zero weighted features are dropped,
    * as the inner join drops them. */
  def scoreProjected(docs: DataFrame, weights: DataFrame,
                     m: Int = defaultBuckets): DataFrame = {
    val arr = new Array[Long](m)
    weights.select(col("b"), col("qf")).collect()
      .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    val qfArr = lit(arr)
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("__toks"))
      .select(col("doc_id"), featureArray(col("__toks")).as("__f"))
      // stage digests, then bucket ids, then the per-occurrence weights
      // (each transform's lambda references its input once — no
      // re-evaluation; nulls propagate through md5/substr and are
      // dropped with the 0-sentinel filter in one pass)
      .select(col("doc_id"),
        transform(col("__f"), f => substring(md5(f), 1, 4)).as("__h"),
        qfArr.as("__qf_arr"))
      .select(col("doc_id"),
        expr(s"transform(__h, h -> element_at(__qf_arr, " +
          s"CAST(CAST(conv(h, 16, 10) AS BIGINT) % $m AS INT) + 1))")
          .as("__w"))
      .select(col("doc_id"),
        filter(col("__w"), w => w.isNotNull && w =!= 0L).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_feats"),
        (aggregate(col("__w"), lit(0L), (acc, w) => acc + w).cast("double") /
          (size(col("__w")).cast("double") * lit(1.0e9))).as("dsir_score"))
  }

  /** Build-and-commit a weight table under an [[graft.core.IndexStore]]
    * path contract: call inside `IndexStore.ensure/replace`'s build
    * closure. The parquet write emits the `_SUCCESS` marker the store
    * expects. */
  def writeWeightIndex(docs: DataFrame, isTarget: Column, scratch: String,
                       m: Int = defaultBuckets): Unit =
    weightTable(docs, isTarget, m)
      .repartition(1) // ≤ m rows — one file reads back as one broadcast
      .write.mode("overwrite").parquet(scratch)

  /** Score a batch against a committed weight index: two column-pruned
    * reads of an m-row parquet, zero corpus work — ingest cost tracks
    * the batch. */
  def scoreAgainstIndex(spark: SparkSession, batch: DataFrame,
                        idxPath: String,
                        m: Int = defaultBuckets): DataFrame =
    scoreFromCounts(featureCounts(batch, m), spark.read.parquet(idxPath))
}
