package graft

import graft.ext.Dedup
import graft.sources.Tables
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming ingest-path near-dup screen vs its batch twin (d9),
  * plus the index-append maintenance cycle. */
class StreamNeardupSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed near-dup against the static index equals the batch incremental query") {
    val docs = Tables(spark, sf()).documents
    val idx = java.nio.file.Files.createTempDirectory("graft-snd").toString
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") % 5 =!= 0), idx)
    val batchRows = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), idx, 0.8)
      .writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    batchRows.grouped(math.max(1, batchRows.length / 3 + 1)).foreach { b =>
      in.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("snd_out")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val batch = Dedup.incrementalNeardup(spark,
        docs.filter(col("doc_id") % 5 === 0), idx, 0.8)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    graft.core.CacheScope.releaseAll()
  }

  test("streamed bloom screen equals the batch screen on the same split, both hash modes") {
    val docs = Tables(spark, sf()).documents
    val bucket = expr(
      Dedup.hexValSql("substr(md5(cast(doc_id as string)),1,8)", 8)) % 100
    val shingled = Dedup.shingleFrame(docs)
      .withColumn("__b", bucket.cast("long"))
    val trainRows = docs
      .join(shingled.filter(col("__b") >= 5).select("doc_id"), "doc_id")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    for (mode <- Seq("md5", "xxh64")) {
      val bits = graft.ext.Bloom.buildBits(
        shingled.filter(col("__b") < 5)
          .select(explode(col("sh")).as("ng")).distinct(), mode)
      val in = MemoryStream[(Long, String)]
      val q = StreamDedup
        .bloomScreen(in.toDF().toDF("doc_id", "text"), bits, mode)
        .writeStream.format("memory").queryName(s"bloom_out_$mode")
        .outputMode("append").start()
      trainRows.grouped(math.max(1, trainRows.length / 3 + 1)).foreach { b =>
        in.addData(b.toSeq); q.processAllAvailable()
      }
      q.stop()
      val streamed = spark.table(s"bloom_out_$mode")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val batch = graft.queries.AnalysisQueries
        .bloomDecontaminate(spark, sf(), mode)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      graft.core.CacheScope.releaseAll()
      assert(streamed === batch, s"mode $mode diverged from the batch screen")
      assert(streamed.nonEmpty)
    }
  }

  test("appendToNeardupIndex: later batches dedup against earlier appends") {
    val idx = java.nio.file.Files.createTempDirectory("graft-snd-app").toString
    val t = "the quick brown fox jumps over the lazy dog again today"
    Dedup.writeNeardupIndex(Seq(
      (1L, "completely different starter text with many distinct words"),
      (2L, "another unrelated corpus document full of other tokens"))
      .toDF("doc_id", "text"), idx)
    // day-1 ingest survivor appended to the index…
    Dedup.appendToNeardupIndex(Seq((10L, t)).toDF("doc_id", "text"), idx)
    // …so the day-2 stream catches its duplicate
    val in = MemoryStream[(Long, String)]
    val q = StreamDedup
      .againstIndex(in.toDF().toDF("doc_id", "text"), idx, 0.8)
      .writeStream.format("memory").queryName("snd_app_out")
      .outputMode("append").start()
    in.addData((20L, t))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("snd_app_out")
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows === Seq((20L, 10L, 1.0)))
  }
}
