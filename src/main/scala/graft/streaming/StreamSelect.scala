package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Selection

/** Streaming importance-weight screen — the selection-tier twin of
  * [[StreamDedup.bloomScreen]]: score arriving documents against a
  * FROZEN DSIR weight table and keep those whose target affinity
  * clears `minScore`.
  *
  * Entirely STATELESS (append mode, no watermark, no state store, no
  * join): [[graft.ext.Selection.scoreProjected]] collects the ≤ m-row
  * weight table ONCE at stream construction and folds it into the
  * projection as an array literal (32 KB at the default m = 4096), so
  * per-micro-batch work is exactly one codegen'd pass over the batch —
  * the same bounded-static-state-in-the-plan shape as the Bloom screen
  * and StreamAnn's collected centroids. After the weight table is
  * retrained ([[graft.ext.Selection.writeWeightIndex]] via
  * `IndexStore.replace`), restart the query to pick up the new
  * literals; a checkpointed screen resumes exactly-once.
  *
  * Output equals the batch [[graft.ext.Selection.score]] filtered at
  * the same threshold, row for row (spec-asserted differentially in
  * `StreamSelectSpec` — integer occurrence sums are association-free,
  * so the projection form and the join form produce identical
  * doubles). */
object StreamSelect {

  /** `stream` must carry (doc_id, text). `weights` is a STATIC (b, qf)
    * frame — e.g. `spark.read.parquet(<committed weight index>)`. */
  def dsirScreen(stream: DataFrame, weights: DataFrame, minScore: Double,
                 m: Int = Selection.defaultBuckets): DataFrame =
    Selection.scoreProjected(stream, weights, m)
      .filter(col("dsir_score") >= minScore)
}
