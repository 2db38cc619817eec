package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ext.Selection
import graft.streaming.StreamSelect

/** The streaming DSIR screen equals the batch scorer at every shape:
  * projection-vs-join agreement, the stream-vs-batch golden, and the
  * committed-index path. */
class StreamSelectSpec extends SparkTestBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val docs = graft.sources.Tables(spark, sf()).documents

  test("scoreProjected equals the broadcast-join score, row for row") {
    val w = Selection.weightTable(docs, col("lang") === "en")
    val joined = Selection.score(docs, w)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val projected = Selection.scoreProjected(docs, w)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    graft.core.CacheScope.releaseAll()
    assert(projected === joined)
    assert(joined.nonEmpty)
  }

  test("streamed dsirScreen equals the filtered batch scorer") {
    val w = Selection.weightTable(docs, col("lang") === "en")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // data-driven threshold (the corpus median score) so the screen
    // provably keeps a nonempty strict subset at any sf
    val allScores = Selection.score(docs, w)
      .select(col("dsir_score")).as[Double].collect().sorted
    val minScore = allScores(allScores.length / 2)
    val in = MemoryStream[(Long, String)]
    val q = StreamSelect
      .dsirScreen(in.toDF().toDF("doc_id", "text"), w, minScore)
      .writeStream.format("memory").queryName("dsir_screen_out")
      .outputMode("append").start()
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
      in.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dsir_screen_out")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val batch = Selection.score(docs, w)
      .filter(col("dsir_score") >= minScore)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    graft.core.CacheScope.releaseAll()
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.size < rows.size,
      "threshold should keep a strict subset")
  }

  test("x_dsir_incremental equals scoring the batch against corpus-trained weights") {
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val direct = Selection.score(batch,
        Selection.weightTable(corpus, col("lang") === "en"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val viaIndex = graft.queries.SelectionQueries
      .dsirIncremental(spark, sf())
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    graft.core.CacheScope.releaseAll()
    assert(viaIndex === direct)
    assert(direct.nonEmpty)
  }
}
