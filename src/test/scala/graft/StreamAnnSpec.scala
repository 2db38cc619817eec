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
