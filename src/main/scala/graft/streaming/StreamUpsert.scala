package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType}

/** The upsert table's streaming writer — the CDC loop closed end to
  * end: the change-detection stream (ref: TradeChangeDetectionJob
  * .java's emit side; `jobs/Jobs.scala` here) feeds straight into
  * [[graft.ext.Upsert.applyChanges]] per micro-batch, so the
  * queryable latest-state table trails the stream by one trigger.
  *
  * Delivery semantics — replay-CONVERGENT, deliberately not
  * batch-id-transactional (contrast [[StreamSink.parquetAppender]],
  * whose appends are not idempotent by content and therefore need
  * the batch=<id> commit): an upsert merge of rows already in the
  * table is a content no-op (UpsertSpec pins it), so an
  * at-least-once replay after a crash — including one that died
  * MID-apply with some buckets swapped and some not — re-merges to
  * the identical table. Out-of-order delivery needs no watermark for
  * correctness either: the table's ordering columns decide every
  * merge, and persisted tombstones make late stragglers lose to
  * deletes they precede.
  *
  * Scale shape per trigger: |batch| + the touched buckets' data —
  * the same bound as the batch form; an idle trigger costs one
  * distinct-collect of zero bucket ids.
  */
object StreamUpsert {

  /** The `foreachBatch` function: attach with
    * `.writeStream.foreachBatch(StreamUpsert.changeApplier(path))`.
    * The micro-batch is persisted across the apply's actions (bucket
    * discovery + staging write) so a pull-based source is not
    * re-read per action. */
  def changeApplier(path: String, opCol: String = "op"): (DataFrame, Long) => Unit =
    (df, _) => {
      val cached = df.persist()
      try graft.ext.Upsert.applyChanges(df.sparkSession, path, cached, opCol)
      finally cached.unpersist(false)
      ()
    }

  /** The merge-on-read `foreachBatch` twin: each micro-batch lands as
    * a `delta=<batchId>` dir — O(|batch|) per trigger, no bucket
    * rewrite, which is the right write mode for high-frequency
    * triggers (the COW applier re-rewrites the same hot buckets every
    * second). Exactly-once rather than merely convergent: the batch
    * id IS the delta id, so a crash-replayed batch finds its
    * committed dir and skips (the StreamSink batch-dir shape). Run
    * [[graft.ext.Upsert.compactDeltas]] on a maintenance cadence to
    * fold deltas into the base before read-side merge cost
    * accumulates — the StreamSink.fold lesson applied to state. */
  /** `compactEvery`: fold pending deltas into the base every N
    * micro-batches — the cadence the measured per-delta read tax is
    * sized against (BASELINE: ~0.03 s/pending delta on every read;
    * 20-50 pending keeps reads sub-second). Safe under crash-replay
    * BECAUSE of the compaction horizon: a replayed batch whose id the
    * fold already consumed is a no-op, not a re-mint (UpsertMorSpec).
    * Leave 0 when feed subscribers tail this table — compaction
    * destroys the delta dirs they have not read yet (the retention
    * contract on [[feed]]). */
  def deltaAppender(path: String, opCol: String = "op",
                    compactEvery: Long = 0L): (DataFrame, Long) => Unit =
    (df, batchId) => {
      graft.ext.Upsert.appendChanges(df.sparkSession, path, df, opCol,
        deltaId = Some(batchId))
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        graft.ext.Upsert.compactDeltas(df.sparkSession, path)
      ()
    }

  /** Subscribe to the table's change feed as a STREAM: Spark's native
    * file source over the committed `delta=*` dirs, surfacing each
    * change row with its `op` and a `delta_id` column (the partition
    * value — with streaming appends, the micro-batch id that produced
    * it). No custom source: the delta commit is one atomic rename of a
    * HIDDEN scratch (Upsert.appendChanges), so the glob lists a delta
    * either not at all or complete — never torn, never twice. The file
    * source's own seen-files log makes the subscription exactly-once
    * across consumer restarts, and incremental listing + per-trigger
    * admission (`maxFilesPerTrigger`) bound each micro-batch.
    *
    * The canonical consumer is a downstream REPLICA: init a table with
    * the same key and `orderCols :+ "delta_id"` and drive
    * [[changeApplier]] from this stream — the extra ordering column
    * replays cross-delta ties to the upstream winner (upstream breaks
    * them by delta id; content ordering alone could flip them).
    * StreamUpsertSpec pins replica == source, deletes included.
    *
    * Retention contract (the Delta-CDF trade): `compactDeltas` DESTROYS
    * the per-delta dirs it folds, so run compaction only after every
    * subscriber has passed those ids — a consumer lagging behind a
    * compact loses the folded window (batch readers get the loud
    * horizon guard; a file stream cannot, its listing just comes up
    * empty).
    *
    * The subscription's schema is a SNAPSHOT of the table's at
    * construction: a delta that later ADDS a column (schema
    * evolution) still flows, but the new column is absent from this
    * stream's rows until the consumer resubscribes — the file
    * source's fixed-schema contract, stated here rather than
    * discovered. */
  def feed(spark: SparkSession, path: String): DataFrame = {
    val up = graft.ext.Upsert.readRaw(spark, path)
    val schema = up.drop("bucket").schema // data cols + op, as stored
      .add("bucket", IntegerType)         // delta files carry bucket as data
      .add("delta", LongType)             // the partition dir = the delta id
    spark.readStream
      .schema(schema)
      .option("basePath", path)
      .parquet(s"$path/delta=*")
      .withColumnRenamed("delta", "delta_id")
      .drop("bucket") // consumers hash their own layout
  }
}
