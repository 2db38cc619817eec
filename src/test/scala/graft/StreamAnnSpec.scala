package graft

import graft.ext.AnnIndex
import graft.sources.Tables
import graft.streaming.StreamAnn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamAnn.againstIndex — the streaming twin of AnnIndex.screen.
  * The load-bearing claim is DIFFERENTIAL: the literal-centroid
  * per-row quantizer (the only piece re-expressed for streaming)
  * reproduces probeCells' (dist, cell) ranking bit for bit, so the
  * stream emits exactly the batch screen's rows. */
class StreamAnnSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables(spark, sf()).embeddings

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-streamann").toString + "/ivf"

  private var runId = 0

  private def runStream(probes: Seq[(Long, Seq[Float])], path: String,
                        minCos: Double, nprobe: Int): Set[(Long, Long, Long, Double)] = {
    implicit val sq = spark.sqlContext
    runId += 1
    val sink = s"stream_ann_out_$runId"
    val mem = MemoryStream[(Long, Seq[Float])]
    val screened = StreamAnn.againstIndex(
      mem.toDF().toDF("vec_id", "embedding"), path, minCos, nprobe)
    val q = screened.writeStream.format("memory")
      .queryName(sink).outputMode("append").start()
    try {
      // two micro-batches — the screen must be per-arrival, not global
      val (first, rest) = probes.splitAt(probes.size / 2)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      spark.table(sink)
        .as[(Long, Long, Long, Double)].collect().toSet
    } finally q.stop()
  }

  private def batchScreen(probes: DataFrame, path: String, minCos: Double,
                          nprobe: Int): Set[(Long, Long, Long, Double)] =
    AnnIndex.screen(probes, path, minCos, nprobe)
      .as[(Long, Long, Long, Double)].collect().toSet

  test("stream screen equals the batch screen row for row (nprobe 1 and 2)") {
    val path = freshPath()
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val probesDf = emb.filter(col("vec_id") % 5 === 0)
    AnnIndex.write(corpus, path)
    val probeRows = probesDf
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    for (nprobe <- Seq(1, 2)) {
      val batch = batchScreen(probesDf, path, 0.2, nprobe)
      graft.core.CacheScope.releaseAll()
      val streamed = runStream(probeRows, path, 0.2, nprobe)
      graft.core.CacheScope.releaseAll()
      assert(streamed === batch, s"stream/batch mismatch at nprobe=$nprobe")
      assert(streamed.nonEmpty, s"degenerate fixture at nprobe=$nprobe")
    }
  }

  test("a quantizer-generation change under a running screen fails the next micro-batch loud; a restart picks up the new quantizer") {
    val path = freshPath()
    AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 0), path)
    val gen0 = AnnIndex.generation(spark, path)
    assert(gen0.nonEmpty, "write must commit a generation id")
    // append reuses the standing quantizer — generation must NOT move
    AnnIndex.append(
      emb.filter(col("vec_id") % 10 === 3).limit(5), path)
    assert(AnnIndex.generation(spark, path) === gen0,
      "append must not bump the quantizer generation")

    val probeRows = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.take(20)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val screened = StreamAnn.againstIndex(
      mem.toDF().toDF("vec_id", "embedding"), path, -1.0, 1)
    val q = screened.writeStream.format("memory")
      .queryName("stream_ann_gen_guard").outputMode("append").start()
    try {
      mem.addData(probeRows.take(10): _*)
      q.processAllAvailable() // first batch passes under the built quantizer
      assert(spark.table("stream_ann_gen_guard").count() > 0)
      // an EXTERNAL maintainer (separate JVM — no shared cache to fail
      // first) republishes the quantizer: simulate exactly what the
      // stream's session observes, a bumped generation sidecar over
      // still-readable rows — the silent-staleness scenario the guard
      // exists for. (An in-session compact also fails the query, but
      // through refreshByPath's recache, before the guard can run.)
      val genFile = new org.apache.hadoop.fs.Path(path, "_graft_ann_gen")
      val fs = genFile.getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(genFile, true)
      try out.write("compacted-elsewhere".getBytes("UTF-8"))
      finally out.close()
      mem.addData(probeRows.drop(10): _*)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("quantizer generation changed")),
        s"expected the generation guard to fail the batch, got: $e")
    } finally q.stop()
    graft.core.CacheScope.releaseAll()

    // a real compact bumps the generation atomically with the rows...
    AnnIndex.compact(spark, path)
    val gen1 = AnnIndex.generation(spark, path)
    assert(gen1.nonEmpty && gen1 != gen0,
      "compact must commit a fresh quantizer generation")
    // ...and a RESTARTED query re-collects the new quantizer and equals
    // the batch screen over the compacted index
    val streamed = runStream(probeRows, path, -1.0, 1)
    graft.core.CacheScope.releaseAll()
    assert(streamed.nonEmpty, "restart must serve the new quantizer")
    assert(streamed === batchScreen(
      emb.filter(col("vec_id") % 5 === 0)
        .join(spark.createDataset(probeRows.map(_._1)).toDF("__id"),
          col("vec_id") === col("__id"), "left_semi"),
      path, -1.0, 1),
      "restarted stream must equal the batch screen over the new index")
  }

  test("a cadence compaction under maintained ingest: restarted screen equals a from-scratch consumer") {
    // the maintenance loop a production ingest runs: appendAndMaybeCompact
    // per batch, cadence sized from ProbeAnnCadence's recall ladder
    // (BASELINE.md round-11). The claim a stream consumer cares about:
    // after the cadence fires and the query is restarted (the generation
    // guard forces that restart — spec above), the screen is
    // INDISTINGUISHABLE from one running against a from-scratch index
    // over everything ingested; recall is the designed-index recall,
    // not a drifted artifact's.
    val path = freshPath()
    val odd = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.write(emb.filter(col("vec_id") % 2 === 0), path)
    val batches = (0 to 2).map(i => odd.filter(col("vec_id") % 3 === i))
    assert(!AnnIndex.appendAndMaybeCompact(batches(0), path, compactEvery = 3))
    assert(!AnnIndex.appendAndMaybeCompact(batches(1), path, compactEvery = 3))
    assert(AnnIndex.appendAndMaybeCompact(batches(2), path, compactEvery = 3),
      "third batch must fire the cadence")
    val probeRows = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.take(24)
    val maintained = runStream(probeRows, path, 0.2, 1)
    graft.core.CacheScope.releaseAll()
    val fresh = freshPath()
    AnnIndex.write(emb, fresh)
    val scratchBuilt = runStream(probeRows, fresh, 0.2, 1)
    graft.core.CacheScope.releaseAll()
    assert(maintained === scratchBuilt,
      "maintained index must serve exactly the from-scratch screen")
    assert(maintained.nonEmpty, "degenerate fixture")
  }

  test("nprobe widens the emitted candidate set monotonically") {
    val path = freshPath()
    AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 0), path)
    val probeRows = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.take(40)
    val np1 = runStream(probeRows, path, -1.0, 1)
    graft.core.CacheScope.releaseAll()
    val np2 = runStream(probeRows, path, -1.0, 2)
    graft.core.CacheScope.releaseAll()
    val pairs1 = np1.map(r => (r._1, r._2))
    val pairs2 = np2.map(r => (r._1, r._2))
    assert(pairs1.subsetOf(pairs2),
      "nprobe=2 must contain every nprobe=1 candidate")
    assert(pairs2.size > pairs1.size,
      "a second probed cell should surface new candidates on this fixture")
  }
}
