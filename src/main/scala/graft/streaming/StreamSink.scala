package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once `foreachBatch` parquet appending — the streaming →
  * warehouse ingestion sink.
  *
  * The gap this closes: Spark's built-in file sink is exactly-once,
  * but any CUSTOM `foreachBatch` writer (the shape every enrich /
  * upsert / multi-sink topology ends up in) is only at-least-once — a
  * crash between the batch's write and the checkpoint offset commit
  * replays the batch on restart and the rows land twice. The standard
  * remedy is an idempotent, batchId-keyed commit; this implements it
  * on the repo's existing artifact protocol
  * ([[graft.core.IndexStore.ensure]], marker-last publish), so a
  * replayed batch finds its directory already committed and skips,
  * and a torn first attempt (markerless target) is recovered and
  * rebuilt — never double-counted, never half-visible.
  *
  * Layout: one `batch=<id>` directory per micro-batch under `root`,
  * so the batch id is provenance the reader gets back as a partition
  * column. `root` and the query's CHECKPOINT form one unit: batch ids
  * restart from 0 under a fresh checkpoint, and a fresh-checkpoint
  * rerun against an old root would silently SKIP every colliding id
  * as a "replay" (data loss, the worse failure). The `streamId`
  * argument (pass the checkpoint location) is the guard: it is
  * committed to a `_stream_id` sidecar on first use — folded with the
  * engine's checkpoint-persisted query id when available, so even a
  * wiped-and-recreated checkpoint at the SAME path is caught — and
  * every later append fails loud on mismatch instead.
  *
  * Exactly-once holds under the same contract as Spark's own file
  * sink: a replayable source and a deterministic batch (a replay must
  * regenerate the same rows for the same id).
  *
  * 100 TB notes: per-batch directories are the small-files generator
  * [[graft.sources.Sinks.compactParquetDir]] exists for — compact a
  * batch dir in place any time (the marker set is untouched). Batches
  * at ids at-or-below the checkpoint's committed head are never
  * replayed, so a retention job may fold old batch dirs into a base
  * table, provided the fold itself is transactional
  * ([[graft.core.IndexStore.replace]]). The listing in
  * [[readCommitted]] is one directory list + one marker probe per
  * batch — object-store-priced like any partitioned read; fold old
  * batches before the directory count becomes the listing bottleneck.
  */
object StreamSink {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private val StreamIdFile = "_stream_id"

  /** Validate-or-establish the root's owning stream identity.
    * First caller commits `streamId` via tmp-write + rename-without-
    * overwrite (first winner's file is always COMPLETE — a torn create
    * would otherwise brick the root for the rightful owner forever);
    * a racing or losing twin reads the winner's and must match. */
  private def checkStreamId(spark: SparkSession, root: String,
                            streamId: String): Unit = {
    val idPath = new Path(root, StreamIdFile)
    val f = fs(spark, idPath)
    if (!f.exists(idPath)) {
      f.mkdirs(new Path(root))
      val tmp = new Path(root,
        StreamIdFile + ".tmp-" + java.util.UUID.randomUUID().toString)
      val out = f.create(tmp, true)
      try out.write(streamId.getBytes("UTF-8")) finally out.close()
      // rename WITHOUT overwrite: exactly one writer publishes; the
      // loser (rename returns false / throws on an existing dst)
      // cleans its tmp and falls through to read the winner's
      val won = try f.rename(tmp, idPath) catch { case _: java.io.IOException => false }
      if (!won) f.delete(tmp, false)
      else return
    }
    val in = f.open(idPath)
    val owner = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
    require(owner == streamId,
      s"sink root $root belongs to stream '$owner' but this query is " +
        s"'$streamId': batch ids would collide and replay-skip would " +
        "silently DROP data. Resume with the original checkpoint, or " +
        "point this query at a fresh root.")
  }

  /** The identity an appender writes to `_stream_id`: the caller's
    * `streamId` plus, when running inside a streaming micro-batch, the
    * engine's own query id. The query id is PERSISTED in the
    * checkpoint's metadata file, so it is stable across legitimate
    * restarts — but a wiped-and-recreated checkpoint at the SAME path
    * mints a new one, which is exactly the case a path-only identity
    * cannot see: batch ids restart at 0 and every collision would be
    * silently replay-skipped. With the query id folded in, that rerun
    * fails the identity check loud instead. */
  private def effectiveId(spark: SparkSession, streamId: String): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .fold(streamId)(qid => s"$streamId#$qid")

  /** Idempotently append one micro-batch. Returns true if this call
    * wrote the batch, false if a committed `batch=<id>` already
    * existed (crash-replay, or a duplicate attempt racing this one —
    * either way the rows are in the store exactly once). */
  def appendBatch(spark: SparkSession, root: String, streamId: String,
                  batchId: Long, df: DataFrame): Boolean = {
    checkStreamId(spark, root, effectiveId(spark, streamId))
    commitBatch(spark, root, batchId, df)
  }

  /** The idempotent commit itself, shared by [[appendBatch]] and the
    * appender's hot path (which validates identity once, not per
    * batch). */
  private def commitBatch(spark: SparkSession, root: String,
                          batchId: Long, df: DataFrame): Boolean = {
    val target = s"$root/batch=$batchId"
    if (graft.core.IndexStore.isCommitted(spark, target)) return false
    // reclaim crash-orphaned scratch dirs from OUR OWN prior attempt
    // at this id (ensure only clears the target, never '.build-'
    // siblings; replace's cleanup is the precedent). Safe here because
    // the stream-id guard serializes writers per root: no concurrent
    // attempt's live scratch can be the victim.
    val f = fs(spark, new Path(root))
    val stale = "batch=" + batchId + "\\.build-.*"
    f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches(stale))
      .foreach(s => f.delete(s.getPath, true))
    var built = false
    graft.core.IndexStore.ensure(spark, target) { scratch =>
      df.write.mode("overwrite").parquet(scratch)
      built = true
    }
    built
  }

  /** The `foreachBatch` function: attach with
    * `.writeStream.foreachBatch(StreamSink.parquetAppender(root, ckpt))
    *  .option("checkpointLocation", ckpt)`. The identity check runs
    * once per appender instance, not once per micro-batch — at a 1 s
    * trigger on an object store the per-batch sidecar read would be
    * pure metadata overhead on the hot path (the batch=<id> commit
    * probe that remains IS the idempotence mechanism). */
  def parquetAppender(root: String, streamId: String): (DataFrame, Long) => Unit = {
    val validated = new java.util.concurrent.atomic.AtomicBoolean(false)
    (df, batchId) => {
      val spark = df.sparkSession
      if (validated.compareAndSet(false, true))
        checkStreamId(spark, root, effectiveId(spark, streamId))
      commitBatch(spark, root, batchId, df)
      ()
    }
  }

  /** Read every COMMITTED batch (marker-checked — a torn dir from a
    * crashed first attempt is invisible), with the `batch` id restored
    * as a partition column via basePath. Empty-schema DataFrame if no
    * batch has committed yet is not constructible without a schema, so
    * an empty root fails loud with the path — the caller knows whether
    * "nothing committed yet" is normal for its topology. */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    // EXACT batch=<digits> names only: IndexStore.ensure builds in
    // sibling 'batch=<id>.build-<uuid>' scratch dirs whose own
    // _SUCCESS exists mid-build — a crash before publish leaves one
    // behind, and a prefix match would read that orphan as a committed
    // batch (double rows after the replay commits the real one, plus a
    // garbage 'batch' partition value). Orphans are publish-never-ran
    // leftovers: invisible here, deleted by the replay's appendBatch.
    val batchDir = "batch=\\d+".r
    val committed = f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory &&
        batchDir.pattern.matcher(s.getPath.getName).matches())
      .map(_.getPath)
      .filter(p => f.exists(new Path(p, "_SUCCESS")))
      .map(_.toString)
    require(committed.nonEmpty, s"no committed batches under $root")
    spark.read.option("basePath", root).parquet(committed: _*)
  }
}
