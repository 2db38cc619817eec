package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.ext.CodesIndex

/** Streaming ingest for the packed SQ8 codes index — the codes tier's
  * twin of [[StreamUpsert.deltaAppender]]: each micro-batch of
  * embeddings-shaped rows (vec_id, embedding) is encoded against the
  * STANDING stats and lands in the committed artifact, so an ANN/
  * curation pipeline's vector ingest keeps the compressed corpus
  * trailing the stream by one trigger.
  *
  * Delivery semantics — EXACTLY-ONCE by batch-id rename commit: the
  * batch encodes into a hidden scratch (`.batch<id>-scratch`, invisible
  * to scans), coalesced to ONE part file, and enters the artifact via a
  * single atomic rename to `batch<id>-<part>` — so a scan sees a
  * micro-batch either not at all or complete, and a crash-replayed
  * batch finds its committed file by name and skips (the
  * StreamSink batch-dir discipline, adapted to a flat artifact dir
  * where one-file-per-batch makes the rename itself the commit).
  * Micro-batches are ingest-sized, so the coalesce(1) is the natural
  * shape, not a bottleneck.
  *
  * Crash windows, stated: the pending count is DERIVED from the
  * committed `batch<id>-*` listing (the file is its own record —
  * [[CodesIndex.streamedBatches]]), so there is no commit-to-count
  * window at all; a leftover scratch from a crash mid-write is hidden
  * from scans and cleared by the replay before it re-encodes.
  *
  * Maintenance composition: the appender deliberately does NOT drive
  * [[CodesIndex.rebuildSq8]] on a cadence — the rebuild re-encodes
  * from a caller-supplied source corpus, and rows this stream appended
  * that are missing from that source would be silently dropped. Run
  * the rebuild at planned stream restarts with a source that includes
  * the streamed rows (the StreamAnn generation-guard lesson: a
  * quantizer swap under a running stream belongs at a restart
  * boundary). Saturation under drift is the signal to rebuild —
  * measured in `tools/ProbeSq8Drift`. */
object StreamCodes {

  /** The `foreachBatch` function: attach with
    * `.writeStream.foreachBatch(StreamCodes.sq8Appender(path))`.
    * `path` must hold a committed SQ8 artifact ([[CodesIndex.writeSq8]]
    * — the stats the encode needs ride in its sidecar). */
  def sq8Appender(path: String): (DataFrame, Long) => Unit =
    appender(path, CodesIndex.appendSq8Batch)

  /** PQ twin: the batch encodes against the artifact's STANDING
    * codebook ([[CodesIndex.appendPqBatch]]) — same rename commit,
    * same replay discipline, same listing-derived pending. `path` must
    * hold a committed PQ artifact ([[CodesIndex.writePq]]). */
  def pqAppender(path: String): (DataFrame, Long) => Unit =
    appender(path, CodesIndex.appendPqBatch)

  /** Shared replay/commit wrapper: skip a batch id whose committed
    * file already exists (crash replay), clear any crashed scratch,
    * delegate the encode+rename to the tier's batch append. */
  private def appender(path: String,
      append: (DataFrame, String, Path, Long) => Unit): (DataFrame, Long) => Unit =
    (df, batchId) => {
      val spark = df.sparkSession
      val dir = new Path(path)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val committed = Option(
        fs.globStatus(new Path(dir, s"batch$batchId-*"))).toSeq.flatten
      val scratch = new Path(dir, s".batch$batchId-scratch")
      if (fs.exists(scratch)) fs.delete(scratch, true) // crashed attempt
      if (committed.isEmpty) {
        append(df, path, scratch, batchId)
      }
      ()
    }
}
