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
  * 100 TB notes: per-batch directories are a small-files/listing
  * generator — a 1 s trigger mints ~86k dirs per day, and
  * [[readCommitted]]'s list + marker probe per dir becomes the
  * bottleneck long before the data does. [[fold]] is the retention
  * half: batches at-or-below the checkpoint's committed head are
  * never replayed, so it merges them into one `fold-<id>` directory.
  * The fold dir IS the manifest — committed atomically by the same
  * marker-last protocol, with the highest committed fold id acting as
  * the reader's high-water mark — so there is no separate mark file
  * whose loss could double- or zero-count folded rows; deleting the
  * merged-away dirs is mere garbage collection behind it.
  * [[graft.sources.Sinks.compactParquetDir]] can then re-lay the flat
  * fold dir to target file sizes any time.
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
    val (foldMark, batches) = liveDirs(spark, root)
    val batchDf = Option.when(batches.nonEmpty) {
      // basePath restores batch as a partition column (inferred int —
      // cast to long so the schema is stable whether or not a fold
      // dir, which carries batch as a regular long, is in the union)
      import org.apache.spark.sql.functions.col
      spark.read.option("basePath", root).parquet(batches.map(_._2): _*)
        .withColumn("batch", col("batch").cast("long"))
    }
    val foldDf = foldMark.map(m => spark.read.parquet(s"$root/fold-$m"))
    val parts = foldDf.toSeq ++ batchDf.toSeq
    require(parts.nonEmpty, s"no committed batches under $root")
    parts.reduce(_ unionByName _)
  }

  /** The live layout under `root`: (highest committed fold id if any,
    * committed (id, path) `batch=<id>` dirs ABOVE it). The fold dir is
    * the manifest: batch dirs at-or-below the fold mark are merged-away
    * leftovers (a crashed fold's pending deletes) and must be
    * invisible, or their rows would double-count. EXACT batch=<digits>
    * names only: IndexStore.ensure builds in sibling
    * 'batch=<id>.build-<uuid>' scratch dirs whose own _SUCCESS exists
    * mid-build — a prefix match would read such an orphan as a
    * committed batch.
    *
    * A fold dir that EXISTS but carries no marker fails LOUD: it means
    * a fold publish or an in-place compaction
    * ([[graft.sources.Sinks.compactParquetDir]] swaps through
    * IndexStore.replace, whose window leaves the dir markerless) is in
    * flight or crashed — and in the compaction case the folded
    * history's batch dirs are already deleted, so "treat as no fold"
    * would silently serve a fraction of the data. Loud-and-retry over
    * silently-wrong; the maintainer's re-run (or replace's own crash
    * recovery) restores the marker. */
  private def liveDirs(spark: SparkSession, root: String)
      : (Option[Long], Seq[(Long, String)]) = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val batchDir = "batch=(\\d+)".r
    val foldDir = "fold-(\\d+)".r
    val entries = f.listStatus(rootPath).toSeq.filter(_.isDirectory)
    def committed(p: Path) = f.exists(new Path(p, "_SUCCESS"))
    val folds = entries.flatMap { s =>
      s.getPath.getName match {
        case foldDir(id) => Some((id.toLong, committed(s.getPath)))
        case _ => None
      }
    }
    folds.filterNot(_._2) match {
      case torn if torn.nonEmpty =>
        throw new IllegalStateException(
          s"fold dir(s) ${torn.map("fold-" + _._1).mkString(", ")} under " +
            s"$root exist without a commit marker: a fold or compaction " +
            "is in flight or crashed; finish or re-run it before reading")
      case _ => ()
    }
    val foldMark = folds.collect { case (id, true) => id }.maxOption
    val batches = entries.flatMap { s =>
      s.getPath.getName match {
        case batchDir(id)
          if foldMark.forall(id.toLong > _) && committed(s.getPath) =>
          Some((id.toLong, s.getPath.toString))
        case _ => None
      }
    }
    (foldMark, batches)
  }

  /** Retention fold — the listing-scale half of the sink. Merges the
    * current fold dir (if any) plus every committed batch dir with id
    * <= `upToBatch` into one `fold-<upToBatch>` directory (batch
    * provenance kept as a regular column), commits it marker-last,
    * then garbage-collects the merged-away dirs. The commit point is
    * the fold dir's own marker: a crash BEFORE it leaves the old view
    * bit-for-bit intact (an uncommitted or lower-id fold dir is
    * invisible), a crash DURING the deletes leaves leftovers the
    * fold-mark rule already hides. Only fold ids the checkpoint has
    * committed past (they can never be replayed); single maintainer,
    * like compact/split. Returns the folded row count. */
  def fold(spark: SparkSession, root: String, upToBatch: Long,
           gcMergedDirs: Boolean = true): Long = {
    val (foldMark, batches) = liveDirs(spark, root)
    require(foldMark.forall(upToBatch > _),
      s"fold($upToBatch) is not above the current fold mark $foldMark")
    // upToBatch must be a batch id that EXISTS: folding past the head
    // (a row count or timestamp passed by mistake) would plant a mark
    // that silently hides every batch the stream commits later at
    // ids <= upToBatch — unbounded data loss from one bad argument
    require(batches.exists(_._1 == upToBatch),
      s"fold($upToBatch): no committed batch=$upToBatch under $root — " +
        "pass the id of an existing checkpoint-committed batch " +
        s"(live ids: ${batches.map(_._1).sorted.takeRight(5).mkString(", ")} ...)")
    val toFold = batches.filter(_._1 <= upToBatch)
    import org.apache.spark.sql.functions.col
    val merged = (foldMark.map(m => spark.read.parquet(s"$root/fold-$m")).toSeq ++
      Option.when(toFold.nonEmpty)(
        spark.read.option("basePath", root).parquet(toFold.map(_._2): _*)
          .withColumn("batch", col("batch").cast("long"))).toSeq)
      .reduce(_ unionByName _)
    var n = 0L
    graft.core.IndexStore.ensure(spark, s"$root/fold-$upToBatch") { scratch =>
      merged.write.mode("overwrite").parquet(scratch)
      n = spark.read.parquet(scratch).count()
    }
    // garbage collection behind the committed manifest: every dir at
    // or below the new mark is already invisible, so a crash anywhere
    // in here is safe. Sweep by the MARK, not by toFold: a crashed
    // previous GC's leftovers (batch dirs <= the old mark, lower fold
    // dirs, fold build-scratch orphans) would otherwise never be
    // reclaimed by any later fold and pay listing cost forever.
    // gcMergedDirs=false defers the whole sweep to a later fold or an
    // ops pass — the retention lag that keeps a LAZY reader's
    // previously-listed paths alive (a DataFrame from readCommitted
    // may execute long after the listing; deleting under it fails the
    // read job). Single-maintainer deployments at a slow cadence can
    // keep the default.
    if (gcMergedDirs) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      val batchSweep = "batch=(\\d+)(\\.build-.*)?".r  // incl. crash orphans
      val foldSweep = "fold-(\\d+)(\\.build-.*)?".r
      f.listStatus(rootPath).toSeq.filter(_.isDirectory).foreach { s =>
        s.getPath.getName match {
          case batchSweep(id, _) if id.toLong <= upToBatch =>
            f.delete(s.getPath, true)
          case foldSweep(id, _) if id.toLong < upToBatch =>
            f.delete(s.getPath, true)
          case _ => ()
        }
      }
    }
    n
  }
}
