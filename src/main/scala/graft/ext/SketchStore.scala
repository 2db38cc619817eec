package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized mergeable sketches — the incremental-analytics
  * pattern the transient sketch tiers (a8, x_vocab_by_source_hll)
  * deliberately do not cover: compute a per-(group, ingest-batch) HLL
  * sketch ONCE at ingest, persist it as a binary parquet row, and
  * answer "distinct over any subset of history" forever after by
  * merging stored sketches — no rescan of the underlying corpus,
  * ever. `hll_sketch_agg`/`hll_union_agg` are the DataSketches HLL
  * surface (Spark 3.5+); unlike `approx_count_distinct`'s internal
  * HLL++, these sketches are first-class VALUES, which is what makes
  * the store possible. HLL union merges registers, so a partitioned
  * store estimates ALMOST what the single-shot sketch does — measured
  * ~1% apart, not bit-identical: sparse-mode promotion order inside
  * the union gadget shifts the estimator slightly (the spec pins the
  * <=2% agreement band plus the <=5%-of-exact error; an equality
  * claim here was tried and measurement refuted it). Appending a
  * batch writes one sketch row per group, ~1.5 KB at lgK=12.
  *
  * 100 TB shape: ingest cost is one map-side sketch pass over the NEW
  * batch only; query cost is group-count × batch-count sketch rows —
  * kilobytes per row regardless of corpus size. The store commits
  * through [[graft.core.IndexStore]] (marker-last; batch appends are
  * new files under the committed dir, the d9/y7 append precedent). */
object SketchStore {

  /** Build the store from scratch: one sketch row per (group, batch).
    * `build` leaves a _SUCCESS-marked artifact — call through
    * [[graft.core.IndexStore.ensure]] for race-safe build-if-absent. */
  def write(rows: DataFrame, groupCol: String, itemCol: String,
            path: String, batchTag: String = "base", lgK: Int = 12): Unit =
    sketchRows(rows, groupCol, itemCol, batchTag, lgK)
      .write.mode("overwrite").parquet(path)

  /** Ingest one new batch: sketches ONLY the new rows, appends one
    * row per group. History is never rescanned — that is the point. */
  def append(rows: DataFrame, groupCol: String, itemCol: String,
             path: String, batchTag: String, lgK: Int = 12): Unit =
    sketchRows(rows, groupCol, itemCol, batchTag, lgK)
      .write.mode("append").parquet(path)

  private def sketchRows(rows: DataFrame, groupCol: String,
                         itemCol: String, batchTag: String,
                         lgK: Int): DataFrame =
    rows.groupBy(col(groupCol).as("grp"))
      .agg(expr(s"hll_sketch_agg($itemCol, $lgK)").as("sketch"))
      .select(col("grp"), lit(batchTag).as("batch_tag"), col("sketch"))

  /** Distinct-count estimates per group over the WHOLE store (or a
    * `batch_tag` slice the caller filters first): a union-merge of
    * kilobyte sketch rows, never a corpus scan. */
  def estimate(spark: SparkSession, path: String): DataFrame =
    estimateFrom(graft.core.IndexStore.read(
      spark, path, "sketch store", "SketchStore.write"))

  def estimateFrom(store: DataFrame): DataFrame =
    store.groupBy(col("grp"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
        .as("distinct_est"))
      .orderBy(col("grp"))
}
