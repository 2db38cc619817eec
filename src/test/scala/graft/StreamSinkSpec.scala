package graft

import graft.streaming.StreamSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The exactly-once foreachBatch sink's contract: rows land exactly
  * once across crash-replay (the at-least-once failure the batchId
  * commit exists for), a torn first attempt is invisible to readers,
  * and a fresh-checkpoint rerun against an old root fails loud
  * instead of silently replay-skipping live data. */
class StreamSinkSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("appends across batches land exactly once, batch id readable as partition column") {
    val root = Files.createTempDirectory("graft-sink").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val in = MemoryStream[Int]
    val q = in.toDS().toDF("v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamSink.parquetAppender(root, ckpt))
      .start()
    in.addData(1, 2); q.processAllAvailable()
    in.addData(3); q.processAllAvailable()
    q.stop()
    val got = StreamSink.readCommitted(spark, root)
      .select("v", "batch").as[(Int, Long)].collect().sorted
    assert(got.toSeq === Seq((1, 0L), (2, 0L), (3, 1L)))
  }

  test("a crash AFTER the append and BEFORE the offset commit does not duplicate the batch") {
    val root = Files.createTempDirectory("graft-sink2").toString
    val ckpt = Files.createTempDirectory("graft-sink2-ckpt").toString
    val in = MemoryStream[Int]
    // the at-least-once window, induced deterministically: batch 1's
    // first attempt appends, then dies before foreachBatch returns —
    // so the engine never commits its offsets and MUST replay batch 1
    // with the same id on restart
    val dieOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val append = StreamSink.parquetAppender(root, ckpt)
    def start() = in.toDS().toDF("v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        append(df, id)
        if (id == 1L && dieOnce.getAndSet(false))
          throw new RuntimeException("induced crash after append, before commit")
      }
      .start()

    val q1 = start()
    in.addData(10); q1.processAllAvailable()
    in.addData(20, 30)
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    q1.stop()
    // batch 1 IS committed in the sink (the append ran) but not in the
    // checkpoint — the exact torn state that duplicates rows in a
    // naive appender
    assert(StreamSink.readCommitted(spark, root).count() === 3)

    val q2 = start() // replays batch 1: appendBatch must skip
    q2.processAllAvailable()
    in.addData(40); q2.processAllAvailable()
    q2.stop()
    val got = StreamSink.readCommitted(spark, root)
      .select("v", "batch").as[(Int, Long)].collect().sorted
    assert(got.toSeq === Seq((10, 0L), (20, 1L), (30, 1L), (40, 2L)),
      s"exactly-once violated: $got")
  }

  test("a torn (markerless) batch directory is invisible to readers and recovered by replay") {
    val root = Files.createTempDirectory("graft-sink3").toString
    val ckpt = Files.createTempDirectory("graft-sink3-ckpt").toString
    Seq(1).toDF("v").write.parquet(s"$root/batch=0")
    // simulate the crash-mid-publish state: data present, no marker
    new java.io.File(s"$root/batch=0/_SUCCESS").delete()
    intercept[IllegalArgumentException] { StreamSink.readCommitted(spark, root) }
    // the same batch id re-attempted (as a replay would): stale target
    // is recovered, the append commits, rows appear exactly once
    assert(StreamSink.appendBatch(spark, root, ckpt, 0L, Seq(7).toDF("v")))
    assert(StreamSink.readCommitted(spark, root).select("v").as[Int].collect().toSeq === Seq(7))
  }

  test("fold merges old batches behind an atomic manifest; leftovers and re-folds stay exactly-once") {
    val root = Files.createTempDirectory("graft-fold").toString
    for (i <- 0L to 3L)
      assert(StreamSink.appendBatch(spark, root, "ck", i, Seq(i.toInt * 10).toDF("v")))
    def snapshot() = StreamSink.readCommitted(spark, root)
      .select("v", "batch").as[(Int, Long)].collect().sorted.toSeq
    val before = snapshot()
    assert(before === Seq((0, 0L), (10, 1L), (20, 2L), (30, 3L)))

    assert(StreamSink.fold(spark, root, 2L) === 3L)
    // same rows, same batch provenance; layout is now fold-2 + batch=3
    assert(snapshot() === before)
    val names = new java.io.File(root).list().toSet
    assert(names.contains("fold-2") && names.contains("batch=3"))
    assert(!names.exists(n => Set("batch=0", "batch=1", "batch=2")(n)))

    // a crashed fold's pending delete: resurrect a merged-away batch
    // dir — the fold mark must keep it invisible (no double rows)
    Seq(99).toDF("v").write.parquet(s"$root/batch=1")
    assert(snapshot() === before)

    // appends continue above the mark, and a re-fold absorbs the
    // previous fold dir plus the newer batches
    assert(StreamSink.appendBatch(spark, root, "ck", 4L, Seq(40).toDF("v")))
    assert(StreamSink.fold(spark, root, 4L) === 5L)
    assert(snapshot() === before ++ Seq((40, 4L)))
    val after = new java.io.File(root).list().toSet
    assert(after.contains("fold-4") && !after.contains("fold-2"))
    // the re-fold's GC sweeps by the MARK, so the crashed-GC leftover
    // (the resurrected batch=1) is reclaimed, not carried forever
    assert(!after.contains("batch=1"), s"leftover below the mark not swept: $after")

    // folding below or at the current mark is refused loud
    intercept[IllegalArgumentException] { StreamSink.fold(spark, root, 4L) }
    // ...as is folding past the newest committed batch (a bad id would
    // plant a mark that hides every later batch at ids below it)
    assert(StreamSink.appendBatch(spark, root, "ck", 5L, Seq(50).toDF("v")))
    intercept[IllegalArgumentException] { StreamSink.fold(spark, root, 999L) }
  }

  test("a wiped-and-recreated checkpoint at the SAME path fails loud, not replay-skip") {
    // rm -rf <ckpt> + restart is the operator mistake a path-only
    // identity cannot see: same path string, but batch ids restart at
    // 0 and every collision would be silently skipped as a "replay".
    // The engine mints a NEW query id for the recreated checkpoint
    // (the old one lived in the wiped metadata file), and the folded
    // identity catches it.
    val root = Files.createTempDirectory("graft-sink5").toString
    val ckpt = Files.createTempDirectory("graft-sink5-ckpt").toString
    val in1 = MemoryStream[Int]
    val q1 = in1.toDS().toDF("v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamSink.parquetAppender(root, ckpt))
      .start()
    in1.addData(1); q1.processAllAvailable(); q1.stop()
    // wipe + recreate the checkpoint at the same path
    import scala.sys.process._
    Seq("rm", "-rf", ckpt).!
    val in2 = MemoryStream[Int]
    val q2 = in2.toDS().toDF("v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamSink.parquetAppender(root, ckpt))
      .start()
    in2.addData(2)
    val e = intercept[Exception] { q2.processAllAvailable(); q2.awaitTermination() }
    q2.stop()
    assert(e.getMessage.contains("belongs to stream"),
      s"expected the identity guard, got: ${e.getMessage}")
    // and the sink still holds exactly the pre-wipe data
    assert(StreamSink.readCommitted(spark, root).count() === 1)
  }

  test("a different stream against an existing root fails loud instead of replay-skipping") {
    val root = Files.createTempDirectory("graft-sink4").toString
    assert(StreamSink.appendBatch(spark, root, "ckpt-A", 0L, Seq(1).toDF("v")))
    val e = intercept[IllegalArgumentException] {
      StreamSink.appendBatch(spark, root, "ckpt-B", 0L, Seq(2).toDF("v"))
    }
    assert(e.getMessage.contains("belongs to stream"))
    // the rightful owner keeps appending fine
    assert(StreamSink.appendBatch(spark, root, "ckpt-A", 1L, Seq(3).toDF("v")))
  }
}
