package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication (SURVEY.md §7 build-plan step 7).
  *
  * Both forms are built-in stateful operators; the watermarked form
  * bounds state to the watermark horizon — the only sane configuration
  * at 100 TB (unbounded dedup state grows with distinct-key count).
  */
object StreamDedup {

  /** Exact streaming dedup on key columns — state grows unbounded
    * (faithful to a reference-style demo; not the production form). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Watermark-bounded dedup: duplicates are only suppressed within the
    * watermark delay on `tsCol`; state for older keys is evicted with
    * the watermark. */
  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
                      cols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(cols)
}
