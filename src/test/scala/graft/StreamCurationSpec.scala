package graft

import java.sql.Timestamp

import graft.streaming.StreamCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming curation slice vs its batch twin: the same corpus fed
  * through controlled micro-batches must curate to the identical set
  * x_curation_pipeline produces, and the watermark must actually bound
  * the dedup state. */
class StreamCurationSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  test("streamed curation equals the batch curation pipeline on the same docs") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamCuration
      .curate(in.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("cur_out")
      .outputMode("append").start()
    // three controlled micro-batches in doc_id order: within the 1h
    // horizon nothing is evicted, and first-seen == min doc_id, so the
    // streamed dedup picks the batch pipeline's canonical docs
    docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { b =>
      in.addData(b.toSeq.map { case (id, text) =>
        (id, text, new Timestamp(base + id)) })
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("cur_out")
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("pred_lang"))
      .as[(Long, Double, Long, String)].collect().sortBy(_._1).toSeq
    val batch = graft.queries.AnalysisQueries.curationPipeline(spark, sf())
      .as[(Long, Double, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("observed metrics: per-batch in/gated/out counters reconcile with the data") {
    val good = (1 to 120).map(i => s"word$i").mkString(" ")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamCuration
      .curate(in.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("cur_obs")
      .outputMode("append").start()
    // batch: 3 docs in, 1 gate-dropped (too short), of the 2 gated one
    // is a dup of the other -> 1 out
    in.addData((1L, good, new Timestamp(base)),
      (2L, "too short", new Timestamp(base + 1)),
      (3L, good, new Timestamp(base + 2)))
    q.processAllAvailable()
    q.stop()
    val m = q.recentProgress.toSeq
      .filter(_.observedMetrics.containsKey("curate_in"))
      .map(p => (p.observedMetrics.get("curate_in").getAs[Long]("docs"),
        p.observedMetrics.get("curate_gated").getAs[Long]("docs"),
        p.observedMetrics.get("curate_out").getAs[Long]("docs")))
      .filter(_._1 > 0)
    assert(m === Seq((3L, 2L, 1L)),
      s"per-batch counters must attribute the drops (gate 1, dup 1): $m")
    assert(spark.table("cur_obs").count() === 1)
  }

  test("watermark bounds the dedup state: a dup beyond the horizon is re-admitted") {
    // quality-passing text: quality = min(n,100)/100 * (1-stopword) *
    // (1-punct), so >= 100 clean non-stopword tokens scores ~1.0
    val text = (1 to 120).map(i => s"word$i").mkString(" ")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamCuration
      .curate(in.toDF().toDF("doc_id", "text", "ts"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("cur_horizon")
      .outputMode("append").start()
    in.addData((1L, text, new Timestamp(base)))
    q.processAllAvailable()
    // advance the watermark far past base + 10s: doc 1's dedup state is
    // evicted (different text so it doesn't collide)
    in.addData((2L, text + " sentinel advancing the stream clock",
      new Timestamp(base + 600000)))
    q.processAllAvailable()
    // the SAME text again, within the new watermark: re-admitted — the
    // bounded-state semantics the batch pipeline cannot express
    in.addData((3L, text, new Timestamp(base + 601000)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("cur_horizon").select("doc_id").as[Long]
      .collect().toSet
    assert(ids === Set(1L, 2L, 3L))
  }
}
