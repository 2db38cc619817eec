package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis => TA}

/** The curation pipeline in the STREAMING runtime — the reference is a
  * stream processor, so the LLM-corpus ops must compose under
  * Structured Streaming too, not just batch (x_curation_pipeline is the
  * batch twin; spec-asserted to produce the identical curated set on
  * the same data fed through controlled micro-batches).
  *
  * Stage order is tuned for streaming state: the quality gate and token
  * budget are STATELESS projections and run BEFORE the dedup, so
  * rejected docs never enter dedup state — on an unbounded stream the
  * state store holds only the md5s of docs worth keeping, inside the
  * watermark horizon. (Batch order — dedup then gate — is result-
  * identical: identical texts gate identically, so the passing set and
  * its per-text canonical survivor are unchanged.)
  */
object StreamCuration {

  /** Quality gate + watermark-bounded exact dedup + token budget over a
    * streaming (doc_id, text, `tsCol`) frame. State is bounded by
    * `delay`: a text re-appearing AFTER the watermark passes its first
    * sighting's horizon is re-admitted — the deliberate price of
    * bounded state at 100 TB (unbounded streaming dedup state grows
    * with distinct-doc count forever; see StreamDedup).
    *
    * Every micro-batch also reports FREE pipeline counters through
    * `StreamingQueryProgress.observedMetrics` — `curate_in` (docs
    * entering), `curate_gated` (past the stateless quality gate),
    * `curate_out` (admitted by the dedup, i.e. emitted — first-seen
    * rows flow through `dropDuplicatesWithinWatermark` in their own
    * batch, so the post-dedup observe counts emissions). Per-batch
    * drop attribution (gate vs dup) comes with the progress event; no
    * second subscription, no recount job — the batch twin's
    * `curateWithMetrics` story at streaming cadence. (The String-name
    * observe form, not an Observation handle: handles don't support
    * streaming queries.) */
  def curate(stream: DataFrame, tsCol: String = "ts",
             delay: String = "10 minutes"): DataFrame = {
    val p = TA.langProfiles
    stream
      .observe("curate_in", count(lit(1)).as("docs"))
      // stage the token array once (HOF lambdas re-evaluate inlined
      // subtrees — same discipline as the batch queries)
      .select(col("doc_id"), col("text"), col(tsCol),
        split(col("text"), "\\s+").as("__toks"))
      .select(col("doc_id"), col("text"), col(tsCol),
        TA.qualityScore(col("__toks"), col("text")).as("quality"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TA.profileScore(col("__toks"), p("en")).as("s_en"),
        TA.profileScore(col("__toks"), p("de")).as("s_de"),
        TA.profileScore(col("__toks"), p("fr")).as("s_fr"),
        TA.profileScore(col("__toks"), p("es")).as("s_es"))
      .withColumn("pred_lang",
        TA.predictLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es")))
      .filter(col("quality") >= 0.5 && col("n_tokens").between(20, 200))
      .observe("curate_gated", count(lit(1)).as("docs"))
      .withColumn("text_md5", md5(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_md5")
      .observe("curate_out", count(lit(1)).as("docs"))
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("pred_lang"))
  }
}
