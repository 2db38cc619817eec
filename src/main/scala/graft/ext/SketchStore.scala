package graft.ext

import org.apache.hadoop.fs.Path
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
  * claim here was tried and measurement refuted it). Each batch
  * writes one sketch row per group, ~1.5 KB at lgK=12.
  *
  * Layout: one `batch_tag=<tag>` directory per ingest batch, each
  * committed by its own `_SUCCESS` (the parquet committer's, exactly
  * the [[graft.streaming.StreamSink]] shape) — so a crashed or torn
  * ingest leaves an uncommitted dir [[estimate]] never reads, and a
  * retried ingest of the same tag is an idempotent no-op instead of a
  * duplicate row set. The tag comes back as a partition column, so
  * callers can estimate over any batch slice.
  *
  * 100 TB shape: ingest cost is one map-side sketch pass over the NEW
  * batch only; query cost is group-count × batch-count sketch rows —
  * kilobytes per row regardless of corpus size. */
object SketchStore {

  /** Ingest one batch: sketch `rows` per group and commit them under
    * `path/batch_tag=<batchTag>`. Idempotent per tag (build-if-absent
    * through [[graft.core.IndexStore.ensure]]): a retry or a racing
    * twin finds the committed dir and skips. Returns true if this
    * call wrote the batch. */
  def ingest(rows: DataFrame, groupCol: String, itemCol: String,
             path: String, batchTag: String, lgK: Int = 12): Boolean = {
    // safe charset keeps the dir name unambiguous vs ensure's
    // '.build-<uuid>' scratch suffix (no dots) and partition encoding
    require(batchTag.matches("[A-Za-z0-9_-]+"),
      s"batchTag must be [A-Za-z0-9_-]+, got '$batchTag'")
    val target = s"$path/batch_tag=$batchTag"
    val spark = rows.sparkSession
    if (graft.core.IndexStore.isCommitted(spark, target)) return false
    var built = false
    graft.core.IndexStore.ensure(spark, target) { scratch =>
      rows.groupBy(col(groupCol).as("grp"))
        .agg(expr(s"hll_sketch_agg($itemCol, $lgK)").as("sketch"))
        .write.mode("overwrite").parquet(scratch)
      built = true
    }
    built
  }

  /** Distinct-count estimates per group over every committed batch
    * (filter the frame from [[readStore]] first for a slice): a
    * union-merge of kilobyte sketch rows, never a corpus scan. */
  def estimate(spark: SparkSession, path: String): DataFrame =
    estimateFrom(readStore(spark, path))

  def estimateFrom(store: DataFrame): DataFrame =
    store.groupBy(col("grp"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
        .as("distinct_est"))
      .orderBy(col("grp"))

  /** Committed batches only — a torn ingest's markerless dir is
    * invisible; `batch_tag` restored as a partition column. */
  def readStore(spark: SparkSession, path: String): DataFrame = {
    val rootPath = new Path(path)
    val f = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tagDir = "batch_tag=.+".r
    val committed = f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory &&
        tagDir.pattern.matcher(s.getPath.getName).matches() &&
        !s.getPath.getName.contains(".build-") &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
    require(committed.nonEmpty,
      s"no committed sketch batches under $path — ingest one with SketchStore.ingest")
    spark.read.option("basePath", path).parquet(committed: _*)
  }
}
