package graft

import graft.ext.CodesIndex
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SQ8 ingest (StreamCodes.sq8Appender): the stream's
  * artifact equals the batch append path's, replays are exactly-once,
  * and the pending counter tracks unique batches. */
class StreamCodesSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed appends equal batch appends; crash replay is exactly-once") {
    implicit val sq = spark.sqlContext
    val emb = Tables(spark, sf()).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamcodes").toString
    val (sPath, bPath) = (s"$root/stream", s"$root/batch")
    CodesIndex.writeSq8(base, sPath)
    CodesIndex.writeSq8(base, bPath)

    val rows = emb.filter(col("vec_id") % 5 === 0)
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(graft.streaming.StreamCodes.sq8Appender(sPath))
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // the batch path over the same two slices
    CodesIndex.appendSq8(emb.filter(col("vec_id") % 5 === 0)
      .filter(col("vec_id").isin(b1.map(_._1): _*)), bPath)
    CodesIndex.appendSq8(emb.filter(col("vec_id") % 5 === 0)
      .filter(col("vec_id").isin(b2.map(_._1): _*)), bPath)

    def decoded(p: String) = CodesIndex.sq8Dequantized(spark, p).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(decoded(sPath) === decoded(bPath),
      "stream and batch ingest must land identical codes")
    assert(CodesIndex.sq8Pending(spark, sPath) === 2)

    // crash replay: re-invoking an already-committed batch id is a no-op
    val before = spark.read.parquet(sPath).count()
    graft.streaming.StreamCodes.sq8Appender(sPath)(
      emb.filter(col("vec_id") % 5 === 0), 1L)
    assert(spark.read.parquet(sPath).count() === before,
      "a replayed batch must not duplicate rows")
    assert(CodesIndex.sq8Pending(spark, sPath) === 2,
      "a replayed batch must not bump pending")
    // the streaming pending is DERIVED from the committed batch-file
    // listing — no counter sidecar exists to lose an increment through
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(sPath, "_graft_sq8_pending")),
      "streamed batches must not write the read-modify-write counter")

    // MIXED ingest: a scheduled batch append on a stream-maintained
    // artifact bumps only its own counter — the streamed batches must
    // not be re-absorbed into it (the compounding double-count)
    CodesIndex.appendSq8(emb.filter(col("vec_id") === 1L), sPath)
    assert(CodesIndex.sq8Pending(spark, sPath) === 3,
      "mixed pending = batch counter (1) + streamed batches (2)")
    assert(CodesIndex.sq8Pending(spark, sPath) === 3,
      "pending must be a stable read, not compound per call")
    CodesIndex.appendSq8(emb.filter(col("vec_id") === 2L), sPath)
    assert(CodesIndex.sq8Pending(spark, sPath) === 4,
      "a second batch append adds exactly one")
  }

  test("streamed PQ appends equal batch appends; replay exactly-once; " +
       "pending derived from the committed listing") {
    implicit val sq = spark.sqlContext
    val emb = Tables(spark, sf()).embeddings
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamcodes-pq").toString
    val (sPath, bPath) = (s"$root/stream", s"$root/batch")
    CodesIndex.writePq(base, sPath)
    CodesIndex.writePq(base, bPath)

    val rows = emb.filter(col("vec_id") % 5 === 0)
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(graft.streaming.StreamCodes.pqAppender(sPath))
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    CodesIndex.appendPq(emb.filter(col("vec_id").isin(b1.map(_._1): _*)), bPath)
    CodesIndex.appendPq(emb.filter(col("vec_id").isin(b2.map(_._1): _*)), bPath)

    // identical codes through the packed readers, and the codebook rows
    // (committed with the base artifact) are untouched by ingest
    def codes(p: String) = CodesIndex.pqCodesOf(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes(sPath) === codes(bPath),
      "stream and batch PQ ingest must land identical codes")
    def cb(p: String) = CodesIndex.pqCodebookOf(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(cb(sPath) === cb(bPath))
    assert(CodesIndex.pqPending(spark, sPath) === 2)

    // crash replay is a no-op and the listing-derived pending holds
    val before = spark.read.parquet(sPath).count()
    graft.streaming.StreamCodes.pqAppender(sPath)(
      emb.filter(col("vec_id") % 5 === 0), 1L)
    assert(spark.read.parquet(sPath).count() === before,
      "a replayed PQ batch must not duplicate rows")
    assert(CodesIndex.pqPending(spark, sPath) === 2)
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(sPath, "_graft_pq_pending")),
      "streamed PQ batches must not write the read-modify-write counter")
  }
}
