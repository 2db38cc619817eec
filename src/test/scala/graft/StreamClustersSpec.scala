package graft

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming cluster-label maintenance (StreamClusters): after the
  * ingest stream delivers the batch docs, the committed labels
  * artifact equals the from-scratch d7 clustering of the combined
  * corpus (the d14 star-forest identity), and a crash-replayed
  * micro-batch is a no-op by merge idempotence. */
class StreamClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed label maintenance equals from-scratch clustering; replay idempotent") {
    implicit val sq = spark.sqlContext
    val docs = Tables(spark, sf()).documents
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamclusters").toString
    val (idxPath, labelsPath) = (s"$root/idx", s"$root/labels")
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idxPath)
    graft.streaming.StreamClusters.initLabels(spark, idxPath, labelsPath, 0.8)

    // the bootstrap is the index-side clustering only
    val boot = spark.read.parquet(labelsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(
        graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8))
      .start()
    try { mem.addData(batch: _*); q.processAllAvailable() } finally q.stop()

    def labels() = spark.read.parquet(labelsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = labels()
    assert(streamed !== boot, "the batch must have merged new pairs")

    // the d14 identity: standing labels + batch/cross pairs == CC over
    // the COMBINED corpus pair graph (d7), hash-equal member for member
    val expected = graft.queries.DedupQueries.dupClusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === expected,
      "streamed label maintenance must equal from-scratch clustering")

    // crash replay: re-delivering the same micro-batch converges to the
    // identical artifact (merge idempotence — no batch bookkeeping)
    graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8)(
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")), 0L)
    assert(labels() === expected, "a replayed batch must be a label no-op")

    // an empty trigger never touches the artifact
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(labelsPath, "_SUCCESS"))
    graft.streaming.StreamClusters.labelMaintainer(idxPath, labelsPath, 0.8)(
      docs.filter(col("doc_id") < 0).select(col("doc_id"), col("text")), 1L)
    assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(labelsPath, "_SUCCESS")) === before,
      "an empty micro-batch must not republish")
  }
}
