package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Quality

/** The quality gate in the ingest path — the streaming twin of
  * [[graft.ext.Quality.writeGated]]: every micro-batch is routed by
  * its row-level verdict into a CLEAN root and a QUARANTINE root, each
  * an exactly-once [[StreamSink]] batch-dir sink (batchId-keyed commit,
  * crash-replays skip — StreamSink's contract, spec'd there).
  *
  * The micro-batch is PERSISTED across the two writes: without it a
  * pull-based source would recompute the whole batch for the second
  * filter — the StreamUpsert.changeApplier lesson. The verdict column
  * is computed once on the cached frame; each sink sees a pure filter
  * of it. Per-trigger cost: |batch| + the two writes, nothing keyed by
  * history.
  *
  * Free counters ride the same stream by wrapping the INPUT with
  * [[graft.ext.Quality.observed]] before attaching this applier — the
  * per-batch ok/total metrics then surface in
  * StreamingQueryProgress.observedMetrics with zero extra jobs. */
object StreamQuality {

  def gatedApplier(checks: Seq[Quality.DqCheck], cleanRoot: String,
                   quarantineRoot: String,
                   streamId: String): (DataFrame, Long) => Unit = {
    val pass = Quality.passExpr(checks) // shared with the batch gate
    val cleanSink = StreamSink.parquetAppender(cleanRoot, streamId)
    val quarantineSink = StreamSink.parquetAppender(quarantineRoot, streamId)
    (df, batchId) => {
      val cached = df.withColumn("__dq_pass", pass).persist()
      try {
        cleanSink(cached.filter(col("__dq_pass")).drop("__dq_pass"), batchId)
        quarantineSink(
          cached.filter(!col("__dq_pass")).drop("__dq_pass"), batchId)
      } finally cached.unpersist(false)
      ()
    }
  }
}
