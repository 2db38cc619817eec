package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.Upsert
import graft.streaming.StreamUpsert
import java.nio.file.Files

/** The streaming upsert's contract: micro-batched change application
  * equals the one-shot batch answer, a crash-replayed batch (the
  * at-least-once window) converges instead of duplicating or
  * corrupting, and deletes flow through the stream. */
class StreamUpsertSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def mkTable(): String = {
    val p = Files.createTempDirectory("graft-supsert").toString + "/t"
    Upsert.init(Seq((1L, 0L, "seed1"), (2L, 0L, "seed2"))
      .toDF("k", "ts", "v"), p, "k", Seq("ts"), 4)
    p
  }

  private def state(p: String): Set[(Long, Long, String)] =
    Upsert.readTable(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("micro-batched changes merge to the one-shot answer, deletes included") {
    val p = mkTable()
    val ckpt = Files.createTempDirectory("graft-supsert-ckpt").toString
    val in = MemoryStream[(Long, Long, String, String)]
    val q = in.toDS().toDF("k", "ts", "v", "op").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamUpsert.changeApplier(p))
      .start()
    in.addData((1L, 10L, "a1", "U"), (3L, 10L, "c1", "U"))
    q.processAllAvailable()
    assert(state(p) === Set((1L, 10L, "a1"), (2L, 0L, "seed2"), (3L, 10L, "c1")))
    in.addData((2L, 20L, "x", "D"), (1L, 20L, "a2", "U"))
    q.processAllAvailable()
    q.stop()
    assert(state(p) === Set((1L, 20L, "a2"), (3L, 10L, "c1")))
    // the delete is a persisted tombstone, not an absence
    assert(Upsert.readRaw(spark, p).filter(col("op") === "D").count() === 1)
  }

  test("feed subscription maintains a replica: replica == source, deletes included") {
    val src = mkTable()
    // three appended deltas, the middle one a delete; the last two
    // carry a same-(k,ts) tie that only delta order can break
    Upsert.appendChanges(spark, src, Seq((1L, 10L, "a1", "U"))
      .toDF("k", "ts", "v", "op"))
    Upsert.appendChanges(spark, src, Seq((2L, 20L, "x", "D"), (1L, 30L, "tie-old", "U"))
      .toDF("k", "ts", "v", "op"))
    Upsert.appendChanges(spark, src, Seq((1L, 30L, "tie-new", "U"), (3L, 5L, "c1", "U"))
      .toDF("k", "ts", "v", "op"))
    // replica: same key, ordering extended by delta_id — the feed
    // scaladoc's canonical consumer shape
    val rep = Files.createTempDirectory("graft-replica").toString + "/t"
    Upsert.init(Seq((1L, 0L, "seed1", -1L), (2L, 0L, "seed2", -1L))
      .toDF("k", "ts", "v", "delta_id"), rep, "k", Seq("ts", "delta_id"), 4)
    val ckpt = Files.createTempDirectory("graft-feed-ckpt").toString
    val q = StreamUpsert.feed(spark, src).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamUpsert.changeApplier(rep))
      .start()
    q.processAllAvailable()
    // a delta appended WHILE the subscription runs is picked up too
    Upsert.appendChanges(spark, src, Seq((4L, 40L, "d1", "U"))
      .toDF("k", "ts", "v", "op"))
    q.processAllAvailable()
    q.stop()
    val srcState = Upsert.readTable(spark, src)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val repState = Upsert.readTable(spark, rep).drop("delta_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(srcState.exists(_._3 == "tie-new"), "upstream tie must go to the later delta")
    assert(repState === srcState,
      "the replica must equal the source table, tie resolution and deletes included")
    // and an in-flight hidden delta scratch is invisible to the glob:
    // junk under .delta-build-* must not reach a new subscriber
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq((9L, 90L, "torn", "U", 0)).toDF("k", "ts", "v", "op", "bucket")
      .write.parquet(src + "/.delta-build-00feed00")
    val ckpt2 = Files.createTempDirectory("graft-feed-ckpt2").toString
    val q2 = StreamUpsert.feed(spark, src).writeStream
      .format("memory").queryName("feed_fresh")
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val seen = spark.table("feed_fresh")
    assert(seen.filter(col("v") === "torn").count() === 0,
      "a mid-build scratch must be invisible to the feed")
    assert(seen.count() === 6, "all six committed change rows replay to a fresh subscriber")
    assert(seen.select("delta_id").distinct().count() === 4)
    f.delete(new org.apache.hadoop.fs.Path(src + "/.delta-build-00feed00"), true)
  }

  test("auto-compaction cadence: deltas stay bounded and a crash-replay across a fold converges") {
    val p = mkTable()
    val ckpt = Files.createTempDirectory("graft-supsert-ckpt3").toString
    val in = MemoryStream[(Long, Long, String, String)]
    val append = StreamUpsert.deltaAppender(p, compactEvery = 2L)
    val dieOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = in.toDS().toDF("k", "ts", "v", "op").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        append(df, id)
        // die right after the fold at batch 2, before the offset
        // commit: the replayed batch 2's id is AT the horizon — the
        // no-op path the horizon exists for
        if (id == 2L && dieOnce.getAndSet(false))
          throw new RuntimeException("induced crash after compaction")
      }.start()
    val q1 = start()
    in.addData((1L, 10L, "a1", "U")); q1.processAllAvailable()   // batch 0
    in.addData((2L, 20L, "b1", "U")); q1.processAllAvailable()   // batch 1
    in.addData((1L, 30L, "a2", "U"))                             // batch 2: append+fold+die
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    q1.stop()
    assert(Upsert.compactionHorizon(spark, p) === 2L)
    val q2 = start() // replays batch 2 over the folded table
    in.addData((3L, 40L, "c1", "U")); q2.processAllAvailable()   // batch 3
    q2.stop()
    assert(state(p) === Set((1L, 30L, "a2"), (2L, 20L, "b1"), (3L, 40L, "c1")),
      "the replay across the fold must not re-apply or drop anything")
    assert(Upsert.deltas(spark, p).size <= 2,
      "the cadence must keep pending deltas bounded")
    assert(Upsert.deltas(spark, p).forall(_ > 2L),
      "no delta id at or below the horizon may be re-minted")
  }

  test("a crash-replayed batch converges: same table, no duplicates") {
    val p = mkTable()
    val ckpt = Files.createTempDirectory("graft-supsert-ckpt2").toString
    val in = MemoryStream[(Long, Long, String, String)]
    val apply0 = StreamUpsert.changeApplier(p)
    val dieOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = in.toDS().toDF("k", "ts", "v", "op").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        apply0(df, id)
        // die AFTER the apply, BEFORE the offset commit: the engine
        // must replay this batch on restart — the at-least-once
        // window a content-idempotent merge absorbs
        if (id == 1L && dieOnce.getAndSet(false))
          throw new RuntimeException("induced crash after apply")
      }.start()

    val q1 = start()
    in.addData((1L, 10L, "a1", "U")); q1.processAllAvailable()
    in.addData((2L, 20L, "gone", "D"), (3L, 20L, "c1", "U"))
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    q1.stop()
    val applied = state(p) // batch 1 IS applied, offsets are not committed
    assert(applied === Set((1L, 10L, "a1"), (3L, 20L, "c1")))

    val q2 = start() // replays batch 1
    q2.processAllAvailable(); q2.stop()
    assert(state(p) === applied, "replayed batch must be a content no-op")
  }
}
